package graft.logql

import graft.promql.{MatchOp, Matcher}

/** LogQL AST — stream selector + ordered pipeline stages, optionally wrapped
  * in a range aggregation and a vector aggregation.
  *
  * Stage ordering is semantic (reference logql/worker_sql.go:105-162): line
  * filters apply to the *current* log line (pre/post line_format), label
  * filters apply where their column exists, label_format can replace
  * existing columns. The compiler folds stages in order.
  */
sealed trait Stage

/** `|= != |~ !~` on the log line */
final case class LineFilter(op: LineFilterOp, needle: String) extends Stage
sealed trait LineFilterOp
object LineFilterOp {
  case object Contains extends LineFilterOp
  case object NotContains extends LineFilterOp
  case object Regex extends LineFilterOp
  case object NotRegex extends LineFilterOp
  /** `|>` / `!>` — Loki 3.x pattern line filters: whole-line match against
    * a pattern whose only placeholders are `<_>` wildcards
    */
  case object Pattern extends LineFilterOp
  case object NotPattern extends LineFilterOp
}

/** `| json` with optional explicit mappings label=jsonpath */
final case class JsonStage(mappings: List[(String, String)]) extends Stage
/** `| logfmt` */
final case class LogfmtStage(mappings: List[(String, String)]) extends Stage
/** `| regexp "(?P<name>...)"` — named capture groups become labels */
final case class RegexpStage(pattern: String) extends Stage
/** `| pattern "<evt> did <act> in <_>"` — Loki's pattern parser: literal
  * text with `<name>` captures (`<_>` skips); compiled to an anchored
  * regex with non-greedy capture groups
  */
final case class PatternStage(pattern: String) extends Stage
/** `| label_format out=src` or `out="{{.a}}-{{.b}}"` */
final case class LabelFormatStage(assignments: List[(String, Template)]) extends Stage
/** `| line_format "{{.a}} ..."` — rewrites the log line */
final case class LineFormatStage(template: Template) extends Stage
/** `| keep a,b` / `| drop a,b` — entries may carry an optional VALUE
  * condition (`drop level="debug"`, Loki semantics): a conditional entry
  * nulls the label only on rows where its value matches, leaving the
  * column in the label set; unconditional entries reshape the label set
  * itself. Equality conditions only (regex matchers not supported here).
  */
final case class KeepStage(labels: List[(String, Option[String])]) extends Stage
final case class DropStage(labels: List[(String, Option[String])]) extends Stage
/** `| label_replace(dst, "repl", src, "regex")` — PromQL's label_replace
  * accepted as a pipeline stage (the reference parser takes it as a stage
  * keyword, logql/parser.go:677): when the regex FULL-matches src's value,
  * dst becomes repl with $N group substitutions; otherwise dst is left
  * unchanged.
  */
final case class LabelReplaceStage(dst: String, repl: String, src: String,
    regex: String) extends Stage
/** `| decolorize` — strip ANSI color escapes from the log line */
case object DecolorizeStage extends Stage
/** `| label op value` — string or numeric comparison */
final case class LabelFilter(label: String, op: String, value: String,
    numeric: Boolean) extends Stage
/** `|= ip("pattern")` / `!= ip("pattern")` — line matches when it contains
  * an IPv4 address inside the pattern (single IP, "a-b" range, or CIDR);
  * Loki's ip() line-filter form (only |= and != compose with ip)
  */
final case class IpLineFilter(negated: Boolean, pattern: String) extends Stage
/** `| label = ip("pattern")` / `!= ip(...)` — label value parses as an
  * IPv4 inside the pattern (negated = complement, including unparseable)
  */
final case class IpLabelFilter(label: String, negated: Boolean,
    pattern: String) extends Stage
/** `| unwrap field` / `unwrap duration(field)` / `unwrap bytes(field)` */
final case class UnwrapStage(field: String, conv: String) extends Stage // conv: "", "duration", "bytes"
/** `| unpack` — Loki's pack-format reader: the line is a JSON object whose
  * `_entry` key carries the original log line (restored as the current
  * line) and whose other keys become labels (need-key analysis decides
  * which to materialize, like `| json`)
  */
case object UnpackStage extends Stage
/** `| distinct a,b` — keep the FIRST line (by chq_tsns, line text as the
  * deterministic tie-break) per distinct combination of label values
  */
final case class DistinctStage(labels: List[String]) extends Stage

/** Go-template subset (reference template compiler,
  * logql/sql_builder.go:636-953): literal text, {{.field}} refs with
  * lower/upper/trim/len pipes, and {{if pred}}…{{else}}…{{end}}
  * conditionals over hasPrefix/hasSuffix/contains/match/eq/ne predicates.
  */
final case class Template(parts: List[TemplatePart])
sealed trait TemplatePart
final case class Lit(text: String) extends TemplatePart
final case class Ref(field: String, fn: String = "") extends TemplatePart // fn: ""|"lower"|"upper"|"trim"|"len"
/** `{{.field | fn arg… | fn …}}` — pipe CHAINS and arg-taking functions
  * (trunc n, substr a b, replace old new, default d) applied left to
  * right; the no-arg pipes (lower/upper/trim/len) compose too
  */
final case class PipedRef(field: String,
    pipes: List[(String, List[String])]) extends TemplatePart
final case class Cond(pred: Pred, thenT: Template, elseT: Template) extends TemplatePart

/** predicate call `fn a b` (reference arg order: needle first, value second
  * for hasPrefix/hasSuffix/contains/match; eq/ne are symmetric)
  */
final case class Pred(fn: String, a: TemplateArg, b: TemplateArg)
sealed trait TemplateArg
final case class FieldArg(name: String) extends TemplateArg
final case class LitArg(value: String) extends TemplateArg

/** `{selector} stage*` */
final case class LogPipeline(matchers: List[Matcher], stages: List[Stage])

/** count_over_time/rate/bytes_over_time/bytes_rate/{sum,avg,min,max,last,
  * count}_over_time-with-unwrap over `pipeline [range] offset?`
  * (offset mirrors the reference's LogRange.Offset, logql/parser.go:113)
  */
final case class LogRangeAgg(fn: String, pipeline: LogPipeline, rangeMs: Long,
    param: Option[Double] = None, // quantile_over_time's q
    offsetMs: Long = 0L)

/** optional vector agg wrapper: sum/avg/min/max/count/topk/bottomk by/without */
final case class LogQuery(
    range: Option[LogRangeAgg],
    vectorOp: Option[String] = None,
    by: List[String] = Nil,
    without: List[String] = Nil,
    param: Option[Double] = None,
    /** raw log query when range is None */
    raw: Option[LogPipeline] = None)

/** Top-level LogQL expression (reference KindBinOp, logql/parser.go:45):
  * a single query, a number literal, or a binop tree over aggregated
  * queries — `sum by(s)(rate(a)) / sum by(s)(rate(b))`, `count_over_time
  * (...) > 10`, `2 * rate(...)`.
  */
sealed trait LogExpr
final case class LeafQuery(q: LogQuery) extends LogExpr
final case class NumberLeaf(v: Double) extends LogExpr
final case class LogBin(op: String, lhs: LogExpr, rhs: LogExpr) extends LogExpr

object Ast {
  val rangeFns: Set[String] = Set(
    "count_over_time", "rate", "bytes_over_time", "bytes_rate",
    "sum_over_time", "avg_over_time", "min_over_time", "max_over_time",
    "last_over_time", "first_over_time", "rate_counter",
    "quantile_over_time", "stddev_over_time", "stdvar_over_time",
    "absent_over_time")
  val vectorOps: Set[String] = Set(
    "sum", "avg", "min", "max", "count", "topk", "bottomk",
    "stddev", "stdvar", "sort", "sort_desc", "approx_topk")
}
