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

  /** One streaming pass over a concatenated-JSON FILE returning
    * top-level value-START byte offsets spaced at least `targetBytes`
    * apart (offset 0 always included) — the planning pass that lets
    * pretty-printed (multiline) files fan out across exact,
    * value-aligned splits instead of one partition per file.
    *
    * Runs the same string-aware depth machine as [[split]], but over
    * raw bytes with O(1) state and no buffering: JSON structural
    * characters are ASCII, and UTF-8 continuation bytes have the high
    * bit set, so byte-level matching never fires inside a multi-byte
    * character. Cost is one sequential scan of the file at planning
    * time — bounded by I/O bandwidth, and strictly cheaper than the
    * single task that would otherwise scan AND parse the whole file.
    */
  def boundaries(in: java.io.InputStream, targetBytes: Long,
      limitBytes: Long = Long.MaxValue): Seq[Long] = {
    val out = ArrayBuffer[Long](0L)
    var last = 0L // offset of the most recent recorded boundary
    var pos = 0L
    var depth = 0
    var inStr = false
    var esc = false
    // 0 = between values, 1 = inside {}/[], 2 = top-level string,
    // 3 = top-level scalar token
    var mode = 0
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n > 0 && pos < limitBytes) {
      var i = 0
      while (i < n && pos < limitBytes) {
        val b = buf(i)
        val c = b.toChar
        val ws = c == ' ' || c == '\n' || c == '\r' || c == '\t'
        mode match {
          case 0 => // between top-level values
            if (!ws) {
              if (pos - last >= targetBytes && pos > 0) {
                out += pos; last = pos
              }
              if (c == '{' || c == '[') { depth = 1; mode = 1 }
              else if (c == '"') { inStr = true; esc = false; mode = 2 }
              else mode = 3
            }
          case 1 => // inside an object/array
            if (esc) esc = false
            else if (inStr) {
              if (c == '\\') esc = true
              else if (c == '"') inStr = false
            } else c match {
              case '"' => inStr = true
              case '{' | '[' => depth += 1
              case '}' | ']' =>
                depth -= 1
                if (depth == 0) mode = 0
              case _ =>
            }
          case 2 => // top-level string value
            if (esc) esc = false
            else if (c == '\\') esc = true
            else if (c == '"') { inStr = false; mode = 0 }
          case _ => // top-level scalar: ends at whitespace or a new opener
            if (ws) mode = 0
            else if (c == '{' || c == '[' || c == '"') {
              // adjacent value starts immediately — reprocess this byte
              mode = 0
              i -= 1; pos -= 1
            }
        }
        i += 1
        pos += 1
      }
      n = in.read(buf)
    }
    out.toSeq
  }

  /** File form of [[boundaries]]. `limitBytes` clamps the scan to the
    * caller's size SNAPSHOT: a file appended between sizing and
    * scanning must not yield boundaries past the snapshot (the
    * planner's partition ends use the snapshot, so an unclamped scan
    * would produce a boundary > end → negative-length partition).
    */
  def boundariesOfFile(file: String, targetBytes: Long,
      limitBytes: Long = Long.MaxValue): Seq[Long] = {
    val in = new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(file)),
      1 << 16)
    try boundaries(in, targetBytes, limitBytes) finally in.close()
  }
}
