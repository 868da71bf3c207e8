package graft.chat

/** Extension -> language mapping (reference: src/language.rs:57-100).
  *
  * Case-insensitive on the extension; unknown extensions map to None.
  * Exposed both as a Scala function (driver/flatMap use) and as a
  * broadcast-joinable Seq for DataFrame-side lookups.
  */
object Language {

  /** display-name -> extensions (language.rs:57-72). */
  val extensionsByLanguage: Seq[(String, Seq[String])] = Seq(
    "Rust"       -> Seq("rs"),
    "JavaScript" -> Seq("js", "jsx", "mjs"),
    "TypeScript" -> Seq("ts", "tsx"),
    "Java"       -> Seq("java"),
    "C++"        -> Seq("cpp", "cxx", "cc", "hpp", "hxx", "hh"),
    "C"          -> Seq("c", "h"),
    "Ruby"       -> Seq("rb"),
    "C#"         -> Seq("cs"),
    "Swift"      -> Seq("swift"),
    "Go"         -> Seq("go"),
    "Python"     -> Seq("py", "pyx", "pyi"),
    "Markdown"   -> Seq("md", "markdown"))

  private val byExtension: Map[String, String] =
    extensionsByLanguage.flatMap { case (lang, exts) => exts.map(_ -> lang) }.toMap

  /** detect_language_from_extension (language.rs:76-100). */
  def detect(extension: String): Option[String] =
    byExtension.get(extension.toLowerCase)

  val supportedExtensions: Seq[String] = extensionsByLanguage.flatMap(_._2)

  /** (extension, language) rows for a broadcast dimension table. */
  val dimensionRows: Seq[(String, String)] =
    extensionsByLanguage.flatMap { case (lang, exts) => exts.map(e => (e, lang)) }
}
