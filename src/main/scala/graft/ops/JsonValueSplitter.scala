package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Splitter for *concatenated* top-level JSON values — the reference's
  * json mode consumes whitespace-separated (not line-delimited) values
  * via `json.NewDecoder` (jsonstreamer.go:40-46, SURVEY.md §2a S2):
  * `{"a":1} 17 "s" [1,2] null {"b":2}` is six records.
  *
  * This is a pure byte-level tokenizer (string-aware brace/bracket
  * matching; no parsing) so it can run per-partition over `wholetext`
  * reads or as the record splitter of a custom streaming source. It
  * does NOT validate JSON — like Go's decoder it finds value
  * boundaries; downstream `from_json` enforces syntax with the E1/E2
  * policies.
  *
  * Mirrored behaviors:
  *  - top-level scalars (numbers, strings, literals) are records
  *  - a malformed tail cannot be bounded → surfaced as the trailing
  *    element for the caller's error policy (E2 fail-fast aborts; E1
  *    skip-and-continue drops) rather than silently lost
  */
object JsonValueSplitter {

  /** Split a chunk of concatenated JSON text into individual value
    * strings. Scalars are delimited by whitespace or a following
    * structural char; strings/objects/arrays by their syntax.
    */
  def split(input: String): Seq[String] = {
    val out = ArrayBuffer[String]()
    val n = input.length
    var i = 0
    while (i < n) {
      while (i < n && input(i).isWhitespace) i += 1
      if (i < n) {
        val start = i
        input(i) match {
          case '{' | '[' =>
            var depth = 0
            var inStr = false
            var esc = false
            var done = false
            while (i < n && !done) {
              val c = input(i)
              if (esc) esc = false
              else if (inStr) {
                if (c == '\\') esc = true
                else if (c == '"') inStr = false
              } else c match {
                case '"' => inStr = true
                case '{' | '[' => depth += 1
                case '}' | ']' =>
                  depth -= 1
                  if (depth == 0) done = true
                case _ =>
              }
              i += 1
            }
            out += input.substring(start, i)
          case '"' =>
            i += 1
            var esc = false
            var done = false
            while (i < n && !done) {
              val c = input(i)
              if (esc) esc = false
              else if (c == '\\') esc = true
              else if (c == '"') done = true
              i += 1
            }
            out += input.substring(start, i)
          case _ =>
            // number / true / false / null / garbage token
            while (i < n && !input(i).isWhitespace &&
              input(i) != '{' && input(i) != '[' && input(i) != '"') i += 1
            out += input.substring(start, i)
        }
      }
    }
    out.toSeq
  }
}
