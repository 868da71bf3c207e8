package graft.chat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.chat.Schemas.RepoProfile

/** Repository profiling aggregations (reference: src/repo.rs, ops A1-A7).
  *
  * Input: a files DataFrame `(path, filename, extension, line_count,
  * content)`. Everything is one aggregation job: lines-per-language sum
  * (A1), build-file collect (A2), top-5-then-filter primary languages
  * (A3 — the take-5-THEN-filter order of repo.rs:135-138 is preserved
  * deliberately), contains-join framework detection over a broadcast
  * pattern table (A4), distinct+sort+truncate (A5), README first-5-lines
  * 200-char summary (A6), and the human_list string agg (A7).
  */
object Profile {

  /** repo.rs:87-122 allowlist (lowercased). */
  val buildFileNames: Seq[String] = Seq(
    "cargo.toml", "cargo.lock", "package.json", "package-lock.json",
    "yarn.lock", "pom.xml", "build.gradle", "gradle.properties",
    "makefile", "cmake.txt", "cmakelists.txt", "pyproject.toml",
    "poetry.lock", "requirements.txt", "setup.py", "gemfile",
    "gemfile.lock", "go.mod", "go.sum", "build.rs", "build.zig",
    "dune-project", "dune", "mix.exs", "rebar.config", "stack.yaml",
    "cabal.project", "project.clj", "deps.edn", "composer.json",
    "composer.lock")

  /** (build_file, substring pattern, framework display name) — the
    * contains-join dimension table (repo.rs:169-358). */
  val frameworkPatterns: Seq[(String, String, String)] = Seq(
    ("cargo.toml", "tokio", "Tokio"), ("cargo.toml", "actix", "Actix"),
    ("cargo.toml", "axum", "Axum"), ("cargo.toml", "warp", "Warp"),
    ("cargo.toml", "rocket", "Rocket"), ("cargo.toml", "serde", "Serde"),
    ("cargo.toml", "clap", "Clap"), ("cargo.toml", "diesel", "Diesel"),
    ("cargo.toml", "sqlx", "SQLx"), ("cargo.toml", "bevy", "Bevy"),
    ("cargo.toml", "tauri", "Tauri"),
    ("package.json", "react", "React"), ("package.json", "vue", "Vue"),
    ("package.json", "angular", "Angular"), ("package.json", "svelte", "Svelte"),
    ("package.json", "next", "Next.js"), ("package.json", "nuxt", "Nuxt.js"),
    ("package.json", "express", "Express"), ("package.json", "fastify", "Fastify"),
    ("package.json", "nestjs", "NestJS"), ("package.json", "typescript", "TypeScript"),
    ("package.json", "webpack", "Webpack"), ("package.json", "vite", "Vite"),
    ("pom.xml", "spring", "Spring"), ("pom.xml", "junit", "JUnit"),
    ("pom.xml", "hibernate", "Hibernate"), ("pom.xml", "jackson", "Jackson"),
    ("pom.xml", "maven", "Maven"),
    ("requirements.txt", "django", "Django"), ("requirements.txt", "flask", "Flask"),
    ("requirements.txt", "fastapi", "FastAPI"), ("requirements.txt", "numpy", "NumPy"),
    ("requirements.txt", "pandas", "Pandas"), ("requirements.txt", "pytorch", "PyTorch"),
    ("requirements.txt", "tensorflow", "TensorFlow"), ("requirements.txt", "poetry", "Poetry"),
    ("pyproject.toml", "django", "Django"), ("pyproject.toml", "flask", "Flask"),
    ("pyproject.toml", "fastapi", "FastAPI"), ("pyproject.toml", "numpy", "NumPy"),
    ("pyproject.toml", "pandas", "Pandas"), ("pyproject.toml", "pytorch", "PyTorch"),
    ("pyproject.toml", "tensorflow", "TensorFlow"), ("pyproject.toml", "poetry", "Poetry"),
    ("go.mod", "gin", "Gin"), ("go.mod", "echo", "Echo"),
    ("go.mod", "fiber", "Fiber"), ("go.mod", "gorm", "GORM"),
    ("go.mod", "cobra", "Cobra"))

  def isBuildFile(filename: String): Boolean =
    buildFileNames.contains(filename.toLowerCase)

  /** A7: "a", "a and b", "a, b, and c" (repo.rs:388-398). */
  def humanList(items: Seq[String], conjunction: String = "and"): String =
    items match {
      case Seq()  => ""
      case Seq(a) => a
      case Seq(a, b) => s"$a $conjunction $b"
      case _ => s"${items.init.mkString(", ")}, $conjunction ${items.last}"
    }

  /** A3: sort desc by line count, take 5, THEN filter > 10 lines
    * (repo.rs:125-141 — order preserved for fidelity). Language names
    * resolve through the extension dimension. */
  def primaryLanguages(files: DataFrame): Seq[String] = {
    val langDim = files.sparkSession
      .createDataFrame(Language.dimensionRows).toDF("ext", "lang")
    files
      .join(broadcast(langDim), lower(col("extension")) === col("ext"))
      .groupBy("lang").agg(sum("line_count").as("loc"))
      .orderBy(col("loc").desc, col("lang").asc)
      .limit(5)
      .filter(col("loc") > 10)
      .select("lang").collect().map(_.getString(0)).toSeq
  }

  /** A2+A4+A5: build-file scan and framework contains-join against the
    * broadcast pattern table; sort+dedup+truncate(10). */
  def detectFrameworks(files: DataFrame): (Seq[String], Seq[String]) = {
    val spark = files.sparkSession
    val builds = files
      .filter(lower(col("filename")).isin(buildFileNames: _*))
      .select(col("filename"), lower(col("content")).as("content_lc"))
      .cache()
    val buildNames = builds.select("filename").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val patterns = spark.createDataFrame(frameworkPatterns)
      .toDF("build_file", "pattern", "framework")
    val fws = builds
      .join(broadcast(patterns), lower(col("filename")) === col("build_file"))
      .filter(col("content_lc").contains(col("pattern")))
      .select("framework").distinct()
      .collect().map(_.getString(0)).toSeq.sorted.take(10)
    builds.unpersist()
    (buildNames, fws)
  }

  /** A6: first README-ish file -> first 5 lines -> 200 chars + "…"
    * (repo.rs:363-385). */
  def readmeSummary(files: DataFrame): Option[String] =
    files.filter(lower(col("filename")).isin("readme.md", "readme.txt", "readme"))
      .orderBy("path")
      .select("content").limit(1)
      .collect().headOption.map { r =>
        val summary = r.getString(0).split("\n").take(5).mkString(" ").take(200).trim
        s"$summary..."
      }

  /** Project-type precedence: a build file beats the primary language
    * (repo.rs:543-561: package.json => "Node.js project" even when the
    * only language is JavaScript). */
  def projectType(buildFiles: Seq[String], primary: Seq[String]): String = {
    val lc = buildFiles.map(_.toLowerCase)
    if (lc.contains("cargo.toml")) "Rust project"
    else if (lc.contains("package.json")) "Node.js project"
    else if (lc.contains("pom.xml") || lc.contains("build.gradle")) "Java project"
    else if (lc.contains("go.mod")) "Go project"
    else if (lc.exists(Seq("pyproject.toml", "requirements.txt", "setup.py").contains))
      "Python project"
    else primary.headOption.map(l => s"$l project").getOrElse("Software project")
  }

  /** The full profile job (S3 producer). */
  def profile(files: DataFrame, name: String): RepoProfile = {
    val primary = primaryLanguages(files)
    val (builds, frameworks) = detectFrameworks(files)
    RepoProfile(name, primary, builds, frameworks, readmeSummary(files))
  }
}
