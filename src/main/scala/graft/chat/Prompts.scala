package graft.chat

import graft.chat.Schemas.{QueryClassification, RepoProfile}

/** The reference's prompt surface, ported verbatim where the text IS
  * the behavior contract (intent templates change what HyDE embeds and
  * how answers cite code):
  *
  *  - query-classification system prompt + strict JSON schema
  *    (hyde.rs:17-60 QUERY_CLASSIFICATION_PROMPT, :353-392 schema,
  *    :394-417 request shape with `response_format.json_schema`
  *    strict);
  *  - intent×language HyDE system prompts (hyde.rs:95-145
  *    generate_hyde_prompt) and the wants_code-gated user input
  *    (hyde.rs:317-336);
  *  - answer persona prompts with repo capabilities (hyde.rs:147-295
  *    generate_answer_prompt), the 5-step investigative methodology
  *    (hyde.rs:615-658), snippet formatting (:660-692), per-intent
  *    context instruction (:694-700), the response template
  *    (:703-728), and the assembled user prompt (:730-739).
  *
  * Everything is a pure function of (classification, profile, query,
  * snippets) so both the HTTP client and the offline mock speak the
  * same templates, and the stub-server spec can assert the exact
  * request bodies.
  */
object Prompts {

  /** repo.rs:401-430 description(): "'name', a X codebase built with Y". */
  def repoDescription(profile: Option[RepoProfile]): String = profile match {
    case None => "a software repository"
    case Some(p) =>
      val parts = Seq.newBuilder[String]
      if (p.primary_languages.nonEmpty) {
        parts += (if (p.primary_languages.size == 1)
          s"a ${p.primary_languages.head} codebase"
        else
          s"a multi-language codebase primarily using ${Profile.humanList(p.primary_languages)}")
      }
      if (p.frameworks.nonEmpty)
        parts += s"built with ${Profile.humanList(p.frameworks)}"
      val ps = parts.result()
      if (ps.isEmpty) s"the '${p.name}' repository"
      else s"'${p.name}', ${ps.mkString(" ")}"
  }

  // -------------------------------------------------------------------
  // L1: classification (hyde.rs:17-60 + :353-392)
  // -------------------------------------------------------------------

  /** hyde.rs:17-60 QUERY_CLASSIFICATION_PROMPT, verbatim. */
  val classificationSystemPrompt: String =
    """
You are a code assistant that analyzes user queries to determine their intent, target programming language, and search scope.

Analyze the user's query and determine:
1. What programming language they're asking about (if any)
2. Whether they want to see actual code implementation (wants_code: true) or just conceptual explanations (wants_code: false)
3. The primary intent of their query
4. Specific folders/directories mentioned (e.g., "src", "tests", "lib", "examples")
5. Specific file extensions mentioned (e.g., "rs", "py", "js")
6. Patterns or folders to exclude (e.g., "test", "docs", "target")

Set wants_code=true for queries asking:
- 'How does X work' (implementation details)
- 'Show me the code for X'
- 'What's the implementation of X'
- 'How is X implemented'
- Questions about algorithms, functions, or code structure
- Questions about specific programming techniques or patterns
- Debugging or troubleshooting code issues

For folder/extension detection, look for phrases like:
- Folder patterns: "in src folder", "from src/", "src directory", "search in tests", "only in lib", "from examples"
- Extension patterns: "only .rs files", "rust files", "*.py files", "just python code", "rs files", "javascript files"
- Exclusion patterns: "exclude tests", "not in target", "skip docs", "no documentation", "no docs", "exclude build"
- File-specific: "main.rs", "lib.rs", "mod.rs" (treat as extension patterns)

IMPORTANT: When you detect these patterns, populate the corresponding fields:
- target_folders: ["src", "tests", "lib"] for folder restrictions
- target_extensions: ["rs", "py", "js"] for extension restrictions (without dots)
- exclude_patterns: ["test", "docs", "target"] for exclusions

Set wants_code=false for queries asking:
- 'What is X' (conceptual explanations)
- 'Explain the concept of X'
- 'What are the benefits of X'
- General documentation or tutorial requests
- Explicit requests for README or documentation content
- High-level architectural or design questions

IMPORTANT: When wants_code=true, the system will EXCLUDE README.md, documentation files, and markdown files from results unless explicitly requested. Focus on actual source code files (.rs, .py, .js, etc.).

Respond with structured JSON containing your analysis.""".stripLineEnd

  /** hyde.rs:353-392: the strict-mode JSON schema for the
    * classification response_format. */
  val classificationSchema: String =
    """{
      |  "type": "object",
      |  "properties": {
      |    "language": {
      |      "type": ["string", "null"],
      |      "description": "Programming language mentioned or implied in the query (e.g., 'rust', 'python', 'javascript')"
      |    },
      |    "intent": {
      |      "type": "string",
      |      "description": "Primary intent of the query (e.g., 'how_it_works', 'implementation', 'explanation', 'debugging')"
      |    },
      |    "wants_code": {
      |      "type": "boolean",
      |      "description": "Whether the user wants to see actual code implementation"
      |    },
      |    "confidence": {
      |      "type": "number",
      |      "minimum": 0.0,
      |      "maximum": 1.0,
      |      "description": "Confidence level in the classification (0.0 to 1.0)"
      |    },
      |    "target_folders": {
      |      "type": ["array", "null"],
      |      "items": {"type": "string"},
      |      "description": "Specific folders/directories mentioned in the query (e.g., ['src', 'tests', 'lib'])"
      |    },
      |    "target_extensions": {
      |      "type": ["array", "null"],
      |      "items": {"type": "string"},
      |      "description": "Specific file extensions mentioned in the query (e.g., ['rs', 'py', 'js'])"
      |    },
      |    "exclude_patterns": {
      |      "type": ["array", "null"],
      |      "items": {"type": "string"},
      |      "description": "Patterns or folders to exclude from search (e.g., ['test', 'docs', 'target'])"
      |    }
      |  },
      |  "required": ["language", "intent", "wants_code", "confidence", "target_folders", "target_extensions", "exclude_patterns"],
      |  "additionalProperties": false
      |}""".stripMargin

  /** hyde.rs:420-424: the classify call's user message. */
  def classificationUser(query: String): String = s"Analyze this query: $query"

  // -------------------------------------------------------------------
  // L2: HyDE (hyde.rs:95-145 + :317-336)
  // -------------------------------------------------------------------

  private def langName(c: QueryClassification, profile: Option[RepoProfile]): String =
    c.language
      .orElse(profile.flatMap(_.primary_languages.headOption))
      .getOrElse("programming")

  private def hydeLanguageContext(c: QueryClassification,
                                  profile: Option[RepoProfile]): String =
    c.language.map(l => s" Focus specifically on ${l.toUpperCase} code.")
      .orElse(profile.flatMap(_.primary_languages.headOption)
        .map(l => s" Focus on $l code."))
      .getOrElse("")

  /** hyde.rs:95-145 generate_hyde_prompt: intent×language system
    * prompt for hypothetical-document generation. */
  def hydeSystemPrompt(c: QueryClassification,
                       profile: Option[RepoProfile] = None): String = {
    val lang = langName(c, profile)
    val ctx = hydeLanguageContext(c, profile)
    c.intent match {
      case "how_it_works" =>
        s"You are a $lang code expert. Generate ONLY actual code implementation that demonstrates how something works internally.$ctx Generate realistic function signatures, struct definitions, impl blocks, and method implementations with descriptive names that match the query topic. Include inline comments explaining the algorithm. Focus on the core implementation logic and data structures. NO prose explanations - only executable code with comments."
      case "implementation" =>
        s"You are a $lang developer. Generate ONLY actual code implementation with realistic function signatures and method bodies.$ctx Show concrete struct definitions, impl blocks, and working code patterns. Include inline comments but NO prose explanations."
      case "explanation" =>
        s"You are a technical writer specializing in $lang. Generate clear explanations with code examples where helpful.$ctx Focus on concepts and understanding."
      case "debugging" =>
        s"You are a $lang debugging expert. Generate hypothetical code that demonstrates common issues, solutions, or debugging techniques.$ctx Focus on problem-solving approaches."
      case _ =>
        s"You are a $lang code assistant. Generate relevant code snippets or explanations.$ctx Be concise and focused."
    }
  }

  /** hyde.rs:325-336: wants_code-gated user input for the HyDE call
    * (the chunk budget rides in the instruction, not a truncation). */
  def hydeUserInput(query: String, c: QueryClassification, chunkSize: Int): String =
    if (c.wants_code)
      s"Query: $query\n\nGenerate actual code implementation (functions, structs, methods) that would answer this query. Use descriptive names that relate to the query topic. Focus on implementation details and core logic. Maximum $chunkSize characters."
    else
      s"Query: $query\n\nGenerate a hypothetical document or explanation under $chunkSize characters that would be relevant to this query."

  /** hyde.rs:584: explain_code_stream wraps its content as "Context:". */
  def hydeContextWrap(input: String): String = s"Context:\n$input\n"

  // -------------------------------------------------------------------
  // L3: answer synthesis (hyde.rs:147-295, :615-739)
  // -------------------------------------------------------------------

  /** hyde.rs:174-211: repo-derived "system capabilities" phrases. */
  def systemCapabilities(profile: Option[RepoProfile]): String = profile match {
    case None => "software development patterns and architectural decisions"
    case Some(p) =>
      val langCaps = p.primary_languages.map {
        case "Rust" => "memory-safe systems programming with ownership and lifetimes"
        case "Python" => "data processing and machine learning capabilities"
        case "JavaScript" | "TypeScript" => "web development and async JavaScript patterns"
        case "Java" => "enterprise application development"
        case "Go" => "concurrent systems and microservices"
        case "C++" => "high-performance computing and systems programming"
        case _ => "modern software development patterns"
      }
      val fwCaps = p.frameworks.flatMap {
        case "Tokio" => Some("async runtime and concurrent processing")
        case "React" => Some("component-based UI development")
        case "Django" | "Flask" | "FastAPI" => Some("web API development")
        case "Spring" => Some("enterprise Java application framework")
        case _ => None
      }
      val caps = langCaps ++ fwCaps
      if (caps.isEmpty) "general software development patterns and architectural decisions"
      else caps.mkString(", ")
  }

  /** hyde.rs:147-295 generate_answer_prompt: the per-intent persona. */
  def answerPersona(c: QueryClassification,
                    profile: Option[RepoProfile]): String = {
    val repoDesc = repoDescription(profile)
    val projType = profile.map(p => Profile.projectType(p.build_files, p.primary_languages))
      .getOrElse("software project")
    val primary = profile.map(_.primary_languages)
      .getOrElse(Seq("programming"))
    val languageContext = c.language.map(l => s" You are analyzing a ${l.toUpperCase} codebase.")
      .orElse(primary.headOption.map(l => s" You are analyzing a $l codebase."))
      .getOrElse("")
    val caps = systemCapabilities(profile)
    c.intent match {
      case "how_it_works" =>
        s"""You are a senior software architect analyzing $repoDesc.$languageContext

This system implements: $caps

When explaining how code works, focus on:
1. The specific algorithms and data structures used
2. How components interact within the larger system architecture
3. The flow of data through the pipeline
4. Design patterns and architectural decisions
5. Performance considerations and optimizations

Use the provided code snippets as concrete examples to illustrate these concepts."""
      case "implementation" =>
        s"""You are a senior software developer providing implementation guidance for $repoDesc, $projType.$languageContext

This system features: $caps

When providing implementation details:
1. Show concrete usage patterns from the actual codebase
2. Explain language-specific patterns and idioms
3. Highlight error handling and robustness patterns
4. Point out performance optimizations and best practices
5. Provide actionable insights for similar implementations

Reference the specific code snippets to demonstrate these patterns."""
      case "explanation" =>
        s"""You are a technical educator explaining $repoDesc.$languageContext

System capabilities: $caps

When explaining concepts:
1. Start with high-level concepts, then dive into specifics
2. Use the code snippets as concrete examples
3. Explain the 'why' behind design decisions
4. Connect individual components to the overall system goals
5. Make complex algorithms accessible through clear explanations

Structure your explanation logically and reference specific code examples."""
      case "debugging" =>
        s"""You are a debugging specialist analyzing $repoDesc.$languageContext

Focus on common areas for issues in this type of system:
- Component integration and data flow
- Error handling and edge cases
- Performance bottlenecks and resource management
- Configuration and setup issues
- Language-specific pitfalls and best practices

When analyzing for debugging:
1. Identify potential failure points in the provided code
2. Explain error patterns and their root causes
3. Suggest specific debugging approaches and logging strategies
4. Point out edge cases and error handling gaps
5. Recommend preventive measures and robustness improvements

Use the code snippets to illustrate both problems and solutions."""
      case _ =>
        s"""You are an expert software engineer analyzing $repoDesc.$languageContext

System features: $caps

Provide accurate, detailed analysis based on the specific code snippets provided. Focus on the actual implementation details and architectural decisions visible in the code."""
    }
  }

  /** hyde.rs:615-658: the 5-step investigative methodology, sent as a
    * second system message. */
  val investigativePrompt: String =
    """INVESTIGATIVE METHODOLOGY:

You are an expert code auditor. Follow this systematic 5-step analysis method internally before writing your answer:

STEP 1: UNDERSTAND THE REQUEST
- Restate the user's exact question in one sentence
- Identify what specific aspect they want to understand (architecture, implementation, flow, etc.)

STEP 2: SCAN AND CATALOG CODE REFERENCES
- Examine each provided code reference
- Note: file paths, important function/struct names, key concepts
- Identify relationships between different code pieces

STEP 3: TRACE EXECUTION FLOW
- Mentally map how the code pieces connect
- Identify entry points, data flow, and call patterns
- Look for the main pipeline or algorithm being implemented

STEP 4: SYNTHESIZE SYSTEM UNDERSTANDING
- Connect individual pieces to the broader architecture
- Identify the key design patterns and architectural decisions
- Understand the "why" behind the implementation choices

STEP 5: EXTRACT KEY INSIGHTS
- Determine the most important takeaway the user needs
- Focus on the core concepts that make the system work

OUTPUT STRUCTURE: You MUST follow this exact template in your response."""

  /** hyde.rs:703-728: the enforced response template. */
  val outputTemplate: String =
    """===== RESPONSE TEMPLATE =====

## 1. Analysis Overview
<One sentence restating the user's question and what you discovered>

## 2. Investigation Plan
<2-4 bullets outlining your analytical approach based on the code references>

## 3. Code Analysis
<For each relevant code reference, explain:>
- **Code Reference X** (file_path): <explanation of what this code does and its role>
- **Key Functions/Structures:** <important symbols found>
- **Role in System:** <how this fits into the bigger picture>

## 4. System Flow & Architecture
<Narrative explanation connecting all the pieces:>
- <How the components interact>
- <Data flow through the system>
- <Key architectural decisions visible in the code>

## 5. Core Insight
<The fundamental concept or mechanism that makes this system work - explain the "why" behind the implementation>

============================="""

  /** hyde.rs:694-700: per-intent analysis-task instruction. */
  def contextInstruction(intent: String): String = intent match {
    case "how_it_works" => "Focus on tracing the execution flow and explaining the algorithmic approach. Show how data moves through the system and what makes each component work internally."
    case "implementation" => "Examine the code patterns and implementation techniques. Show concrete examples of how the system is built and what patterns can be reused."
    case "explanation" => "Provide a comprehensive explanation that connects high-level concepts to specific implementation details. Make complex algorithms accessible while maintaining technical accuracy."
    case "debugging" => "Analyze potential failure points and debugging strategies. Look for error patterns, edge cases, and areas for improvement in the provided code."
    case _ => "Analyze the code systematically to provide a complete understanding of how this part of the system works."
  }

  /** hyde.rs:660-692: snippet block formatting. The snippet tuple is
    * (file, code, distance, chunkId, language, extension). */
  def formatSnippet(idx: Int, file: String, code: String, distance: Double,
                    chunkId: Long, language: Option[String],
                    extension: Option[String]): String = {
    val langInfo = language.map(l => s" [${l.toUpperCase}]").getOrElse("")
    val extInfo = extension.map(e => s".$e").getOrElse("")
    val cleanPath = file.stripPrefix("./")
    f"""## Code Reference ${idx + 1} - $cleanPath$extInfo$langInfo
**Location:** $cleanPath
**Relevance Score:** $distance%.3f (lower = more relevant)
**Chunk ID:** $chunkId

```${language.getOrElse("rust")}
${code.trim}```
"""
  }

  /** hyde.rs:690-693: system context line of the user prompt. */
  def systemContext(profile: Option[RepoProfile]): String = profile match {
    case Some(_) => s"You are analyzing ${repoDescription(profile)}"
    case None    => "You are analyzing a software repository"
  }

  /** hyde.rs:730-739: the assembled synthesis user prompt. */
  def answerUserPrompt(query: String, c: QueryClassification,
                       profile: Option[RepoProfile],
                       formattedSnippets: Seq[String]): String =
    s"""# User Query
$query

# Analysis Task
${contextInstruction(c.intent)}

# System Context
${systemContext(profile)}

# Available Code References
${formattedSnippets.mkString("\n\n")}

$outputTemplate"""
}
