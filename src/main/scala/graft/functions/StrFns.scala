package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `.str` accessor surface (~60 methods,
  * `xarray/core/accessor_str.py:144-2899`) as codegen'd Column functions.
  * Every method is a native Spark expression — no UDFs — so the whole
  * battery stays inside WholeStageCodegen.
  */
object StrFns {
  def len(c: Column): Column = length(c)                       // accessor_str len
  def get(c: Column, i: Int): Column = substring(c, i + 1, 1)  // 0-based get
  def slice(c: Column, start: Int, stop: Int): Column =        // python slice
    substring(c, start + 1, stop - start)
  def capitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(c.substr(lit(2), length(c))))
  def lowerS(c: Column): Column = lower(c)
  def upperS(c: Column): Column = upper(c)
  def title(c: Column): Column = initcap(c)
  def swapcase(c: Column): Column = {
    // per-char case flip via translate of the ASCII alphabet
    val lo = "abcdefghijklmnopqrstuvwxyz"
    val up = lo.toUpperCase
    translate(c, lo + up, up + lo)
  }
  def isAlpha(c: Column): Column = c.rlike("^[A-Za-z]+$")
  def isDigit(c: Column): Column = c.rlike("^[0-9]+$")
  def isSpace(c: Column): Column = c.rlike("^\\s+$")
  def isLower(c: Column): Column = c === lower(c) && c.rlike("[a-z]")
  def isUpper(c: Column): Column = c === upper(c) && c.rlike("[A-Z]")
  def countMatches(c: Column, pattern: String): Column = regexp_count(c, lit(pattern))
  def startswith(c: Column, p: String): Column = c.startsWith(p)
  def endswith(c: Column, p: String): Column = c.endsWith(p)
  def pad(c: Column, width: Int, side: String, fillchar: String = " "): Column =
    side match {
      case "left"  => lpad(c, width, fillchar)
      case "right" => rpad(c, width, fillchar)
      case "both"  => // center: numpy puts extra pad on the right
        rpad(lpad(c, ((lit(width) + length(c)) / 2).cast("int"), lit(fillchar)),
          lit(width), lit(fillchar))
    }
  def center(c: Column, width: Int, fillchar: String = " "): Column =
    pad(c, width, "both", fillchar)
  def zfill(c: Column, width: Int): Column = lpad(c, width, "0")
  def containsLiteral(c: Column, s: String): Column = c.contains(s)
  def containsRegex(c: Column, p: String): Column = c.rlike(p)
  def matchS(c: Column, p: String): Column = c.rlike("^(?:" + p + ")")
  def fullmatch(c: Column, p: String): Column = c.rlike("^(?:" + p + ")$")
  def strip(c: Column): Column = trim(c)
  def lstrip(c: Column): Column = ltrim(c)
  def rstrip(c: Column): Column = rtrim(c)
  def translateS(c: Column, from: String, to: String): Column = translate(c, from, to)
  def repeatS(c: Column, n: Int): Column = repeat(c, n)
  def find(c: Column, sub: String): Column = instr(c, sub) - 1  // -1 when absent
  def replaceRegex(c: Column, p: String, r: String): Column = regexp_replace(c, p, r)
  def extract(c: Column, p: String, group: Int): Column = regexp_extract(c, p, group)
  def extractAll(c: Column, p: String, group: Int): Column =
    regexp_extract_all(c, lit(p), lit(group))
  def findall(c: Column, p: String): Column = regexp_extract_all(c, lit(p), lit(0))
  def splitS(c: Column, sep: String): Column = split(c, sep)
  def partitionS(c: Column, sep: String): Column = {
    val i = instr(c, sep)
    struct(
      when(i > 0, substring_index(c, sep, 1)).otherwise(c).as("head"),
      when(i > 0, lit(sep)).otherwise(lit("")).as("sep"),
      when(i > 0, c.substr(i + sep.length, length(c))).otherwise(lit("")).as("tail"))
  }
  def cat(cols: Seq[Column], sep: String): Column = concat_ws(sep, cols: _*)
  def join(c: Column, sep: String): Column = array_join(c, sep)
  def encodeS(c: Column, charset: String): Column = encode(c, charset)
  def decodeS(c: Column, charset: String): Column = decode(c, charset)
  def normalizeWs(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  // --- long tail (`accessor_str.py` get_dummies:1048, wrap:2223,
  // rfind:1564, rpartition:2404, removeprefix/suffix:834, slice_replace:
  // 2478, casefold:1088, isalnum:2899) ---

  /** pandas-style get_dummies against a FIXED vocabulary: one 0/1 field per
    * vocab entry. The dynamic-column variant needs the vocabulary first —
    * at scale that's a separate distinct-agg pass feeding this. */
  def getDummies(c: Column, sep: String, vocab: Seq[String]): Column = {
    val toks = split(c, java.util.regex.Pattern.quote(sep))
    // NA mode (`accessor_str.py:1048`): a null string dummies to all-0s,
    // like pandas get_dummies on NaN — not to a null struct
    struct(vocab.map(v =>
      coalesce(array_contains(toks, v), lit(false)).cast("int").as(v)): _*)
  }

  /** Greedy word-boundary line fill (textwrap.wrap with default
    * break_long_words folded to the regex greedy-fill idiom). */
  def wrap(c: Column, width: Int): Column =
    rtrim(regexp_replace(c, s"(.{1,$width})( +|$$)", "$1\n"), "\n")

  /** 0-based index of the LAST occurrence of `sub`, -1 when absent. */
  def rfind(c: Column, sub: String): Column = {
    val posR = instr(reverse(c), sub.reverse)
    when(posR === 0, -1)
      .otherwise(length(c) - posR - lit(sub.length) + 1)
  }

  /** Split on the LAST occurrence of `sep`: (head, sep, tail); when absent,
    * pandas puts the whole string in the TAIL slot. */
  def rpartitionS(c: Column, sep: String): Column = {
    val posR = instr(reverse(c), sep.reverse)
    val idx = length(c) - posR - lit(sep.length) + 1 // 0-based start of last sep
    struct(
      when(posR > 0, c.substr(lit(1), idx)).otherwise(lit("")).as("head"),
      when(posR > 0, lit(sep)).otherwise(lit("")).as("sep"),
      when(posR > 0, c.substr(idx + lit(1 + sep.length), length(c)))
        .otherwise(c).as("tail"))
  }

  def removeprefix(c: Column, p: String): Column =
    when(c.startsWith(p), substring(c, p.length + 1, Int.MaxValue)).otherwise(c)

  def removesuffix(c: Column, s: String): Column =
    when(c.endsWith(s), c.substr(lit(1), length(c) - s.length)).otherwise(c)

  /** Replace the python slice [start, stop) with `repl`. */
  def sliceReplace(c: Column, start: Int, stop: Int, repl: String): Column =
    concat(substring(c, 1, start), lit(repl),
      c.substr(lit(stop + 1), length(c)))

  /** casefold ~ lower for the ASCII data this engine targets. */
  def casefold(c: Column): Column = lower(c)

  /** Unicode normalization (`accessor_str.py:1879` normalize). */
  def normalizeUnicode(c: Column, form: String): Column =
    graft.exprs.MathExprs.unicodeNormalize(c, form)

  /** istitle (`accessor_str.py:2899` family): every word starts upper,
    * continues lower — expressed as the initcap fixed point. */
  def isTitle(c: Column): Column =
    c === initcap(c) && c.rlike("[A-Za-z]")

  /** rsplit with maxsplit=1 (`accessor_str.py:2404` family): split on the
    * LAST `sep`; pandas keeps a single element when `sep` is absent, so
    * the tail slot is null then. Regex form keeps both engines identical. */
  def rsplit1Head(c: Column, sep: String): Column = {
    require(sep.length == 1, "rsplit1 supports single-char separators")
    when(c.contains(sep),
      regexp_extract(c, "^(.*)" + java.util.regex.Pattern.quote(sep) +
        "([^" + java.util.regex.Pattern.quote(sep) + "]*)$", 1)).otherwise(c)
  }
  def rsplit1Tail(c: Column, sep: String): Column = {
    require(sep.length == 1, "rsplit1 supports single-char separators")
    when(c.contains(sep),
      regexp_extract(c, "^(.*)" + java.util.regex.Pattern.quote(sep) +
        "([^" + java.util.regex.Pattern.quote(sep) + "]*)$", 2))
      .otherwise(lit(null).cast("string"))
  }

  def isAlnum(c: Column): Column = c.rlike("^[A-Za-z0-9]+$")

  /** Unicode-category is* predicates (`accessor_str.py` isdecimal:2856,
    * isdigit:2870, isnumeric:2884 — distinct classes: decimal ⊂ digit ⊂
    * numeric; '²' is digit+numeric but not decimal, '½' numeric only). */
  def isDecimalU(c: Column): Column = graft.exprs.MathExprs.strIsClass(c, "decimal")
  def isDigitU(c: Column): Column = graft.exprs.MathExprs.strIsClass(c, "digit")
  def isNumericU(c: Column): Column = graft.exprs.MathExprs.strIsClass(c, "numeric")

  /** index/rindex (`accessor_str.py:737,758`) — the raise-variants of
    * find/rfind: ValueError when the substring is absent becomes a
    * per-row raise_error (ANSI-style loud failure, not a silent -1). */
  def index(c: Column, sub: String): Column = {
    val f = find(c, sub)
    when(f === -1, raise_error(concat(
      lit(s"substring '$sub' not found in: "), c)).cast("int")).otherwise(f)
  }
  def rindex(c: Column, sub: String): Column = {
    val f = rfind(c, sub)
    when(f === -1, raise_error(concat(
      lit(s"substring '$sub' not found in: "), c)).cast("int")).otherwise(f)
  }
}
