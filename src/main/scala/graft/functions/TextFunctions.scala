package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis functions for the training-data pipeline
  * extensions (builder brief; beyond the reference surface — the
  * reference's only string ops are contains/startswith/endswith/slice,
  * SURVEY §2.4). All are codegen'd built-in expression compositions —
  * no UDFs — so they stay inside whole-stage codegen and push work to
  * executors at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization; safe on empty/blank strings. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** [[words]] as a SQL-expression fragment, for use inside `expr`
    * strings (higher-order-function pipelines).
    */
  def wordsSql(colName: String): String =
    s"split(trim($colName), '\\\\s+')"

  /** Token count under whitespace tokenization. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(words(text)))

  /** Canonical form for near-dup detection: lowercase, collapsed
    * whitespace.
    */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic 128-bit document fingerprint (hex) of the canonical
    * form. md5 is identical across engines, which keeps this
    * oracle-checkable (unlike murmur/xxhash which are
    * engine-specific).
    */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** BPE-ish regex tokenizer: letter runs, digit runs, single other
    * non-space symbols — the standard pre-tokenization shape.
    */
  val tokenPattern = "[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(tokenPattern), lit(0))
  def regexTokenCount(text: Column): Column = size(regexTokens(text))

  /** Tiny stopword inventories per language for the n-gram/stopword
    * language-ID heuristic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "y", "los", "que"))
}
