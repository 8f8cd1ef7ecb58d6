package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-SQL lint: DuckDB's sum() over integer inputs returns HUGEINT,
  * which the driver's compare path renders as float64 — so a Spark
  * BIGINT `40` hash-mismatches an oracle `40.0` even though the values
  * agree (round-4 `pack_shards` failure). Any integer-summing oracle
  * expression whose result can reach the final output must carry an
  * explicit `::BIGINT` (or `::DOUBLE`) cast.
  *
  * This spec scans every registered oracle for `sum(<integer-ish arg>)`
  * not immediately followed by a `::` cast (window clause included) and
  * fails on anything outside the reviewed allowlist of intermediates
  * whose HUGEINT never reaches the output (they feed float arithmetic
  * or comparisons only).
  */
class OracleLintSpec extends AnyFunSuite {

  /** Columns/aliases known DOUBLE-typed in the test tables or derived
    * CTEs — sum() over these returns DOUBLE, no HUGEINT risk.
    */
  private val doubleish = Set(
    "value", "l_extendedprice", "l_quantity", "l_discount", "o_totalprice",
    "w", "v", "tf", "dot", "ns", "score", "sim", "revenue", "amount",
    "raw_count", // raw_count = sum(l_quantity::DOUBLE), stays DOUBLE
    // sc_markers moment CTE: n_in = count(v)::DOUBLE, s_in/ss_in sum
    // the DOUBLE v — re-summing them for per-feature totals stays DOUBLE
    "n_in", "s_in", "ss_in",
    // deg_centrality power iteration: abs_corr is round(...,6) DOUBLE,
    // y = x + sx with x DOUBLE — sum(y*y) is the L2 norm accumulator
    "abs_corr", "y",
    // txt_lm_score: logp = ln(...) DOUBLE; cnt*logp stays DOUBLE
    "logp",
    // emb_drift centroid components: vo/vn = avg(v) DOUBLE
    "vo", "vn",
    // mix_temperature: wraw = round(pow(...), 6) DOUBLE
    "wraw")

  /** Reviewed intermediates: HUGEINT result is consumed by float
    * arithmetic or a comparison, never emitted. Key = query name,
    * value = expected count of such sums in that oracle.
    */
  private val allowlist: Map[String, Int] = Map(
    "dedup_simhash" -> 64) // bit-vote sums, consumed by `> 0` CASE

  /** Index just past the paren that matches the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    s.length
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s(i).isWhitespace) i += 1
    i
  }

  /** True when the sum argument is integer-typed as far as the lint can
    * tell: bare identifier not known-double, integer literals, or a
    * CASE ladder over integer literals. Anything containing a float
    * literal, a known-double column, or a division is treated as
    * double-producing and skipped.
    */
  private def integerish(arg: String): Boolean = {
    val a = arg.toLowerCase
    if (a.contains(".") || a.contains("1e") || a.contains("/") ||
      a.contains("::double") || a.contains("::float") ||
      Seq("ln(", "log(", "exp(", "sqrt(").exists(a.contains)) false
    else {
      val idents = "[a-z_][a-z_0-9]*".r.findAllIn(a)
        .filterNot(Set("case", "when", "then", "else", "end", "and",
          "or", "not", "is", "null", "in", "between").contains)
        .toSet
      idents.intersect(doubleish).isEmpty
    }
  }

  private def uncastIntegerSums(sql: String): Int = {
    val s = sql
    val lower = s.toLowerCase
    var count = 0
    var from = 0
    while ({ from = lower.indexOf("sum(", from); from >= 0 }) {
      // `sum` must be a standalone token (not e.g. `checksum(`)
      val standalone = from == 0 ||
        (!lower(from - 1).isLetterOrDigit && lower(from - 1) != '_')
      val open = from + 3
      val end = matchParen(s, open)
      val arg = s.substring(open + 1, end - 1)
      if (standalone && integerish(arg)) {
        // after sum(...): either `::cast`, or `OVER (...)` then
        // `::cast`, or a wrapping `(...)::cast` one paren out
        var i = skipWs(s, end)
        if (lower.startsWith("over", i)) {
          i = skipWs(s, i + 4)
          if (i < s.length && s(i) == '(') i = matchParen(s, i)
        }
        val direct = s.startsWith("::", i)
        val wrapped = i < s.length && s(i) == ')' &&
          s.startsWith("::", skipWs(s, i + 1))
        if (!direct && !wrapped) count += 1
      }
      from = end
    }
    count
  }

  test("no oracle emits an uncast integer sum (DuckDB HUGEINT trap)") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val n = uncastIntegerSums(sql)
        val allowed = allowlist.getOrElse(name, 0)
        if (n != allowed) Some(s"$name: $n uncast integer sums (allowlisted: $allowed)")
        else None
    }
    assert(violations.isEmpty,
      "uncast integer sum() in oracle SQL — DuckDB returns HUGEINT " +
        "which the driver compares as float64; add ::BIGINT. " +
        violations.mkString("; "))
  }

  test("the d=768 oracle rebind lints clean and changes ONLY the two " +
    "PQ rows") {
    val base = SparkEntry.oracleSql
    val at768 = SparkEntry.oracleSqlAt(768)
    assert(at768.keySet == base.keySet)
    val changed = at768.keys.filter(k => at768(k) != base(k)).toSet
    assert(changed == Set("vs_pq_adc", "vs_ivf_pq"),
      s"dim rebind leaked beyond the PQ rows: $changed")
    // the rebound strings must carry the d=768 subspace width and
    // pass the same HUGEINT lint as the published map
    changed.foreach { k =>
      assert(at768(k).contains("192"), s"$k: dsub 192 missing at d=768")
      assert(uncastIntegerSums(at768(k)) == allowlist.getOrElse(k, 0))
    }
    // identity at the published dim — the rebind is a pure function
    // of its argument, not a second source of truth
    assert(SparkEntry.oracleSqlAt(64) == base)
  }
}
