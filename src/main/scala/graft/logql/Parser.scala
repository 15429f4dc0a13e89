package graft.logql

import graft.promql.{MatchOp, Matcher}
import graft.promql.{Parser => PParser}

/** Hand-written LogQL parser for the subset in SURVEY.md §7.5: stream
  * selector, line filters, parser stages, label filters, label_format /
  * line_format templates, unwrap (+duration/bytes), keep/drop, range
  * aggregations and vector aggregations with by/without.
  */
object Parser {
  final class ParseError(msg: String) extends RuntimeException(msg)

  def parse(input: String): Either[String, LogQuery] =
    try Right(new LogParser(input).parseQuery())
    catch { case e: ParseError => Left(e.getMessage) }

  /** full expression grammar: binops between aggregated queries and number
    * literals (reference KindBinOp); raw pipeline queries parse as a plain
    * [[LeafQuery]]
    */
  def parseFull(input: String): Either[String, LogExpr] =
    try Right(new LogParser(input).parseExprTop())
    catch { case e: ParseError => Left(e.getMessage) }

  // template tokens: literal runs and {{...}} action bodies
  private sealed trait Tok
  private final case class TLit(s: String) extends Tok
  private final case class TAct(body: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val sb = new StringBuilder
    while (i < s.length) {
      if (s.startsWith("{{", i)) {
        if (sb.nonEmpty) { toks += TLit(sb.toString); sb.clear() }
        val end = s.indexOf("}}", i)
        if (end < 0) throw new ParseError(s"unterminated template ref in '$s'")
        toks += TAct(s.substring(i + 2, end).trim)
        i = end + 2
      } else { sb += s(i); i += 1 }
    }
    if (sb.nonEmpty) toks += TLit(sb.toString)
    toks.toList
  }

  def parseTemplate(s: String): Template = {
    val (parts, rest) = parseParts(tokenize(s))
    if (rest.nonEmpty) throw new ParseError(s"unbalanced {{end}}/{{else}} in '$s'")
    Template(parts)
  }

  /** parse parts until an unconsumed `else`/`end` action (left in `rest`) */
  private def parseParts(toks: List[Tok]): (List[TemplatePart], List[Tok]) =
    toks match {
      case Nil => (Nil, Nil)
      case TLit(s) :: rest =>
        val (ps, r) = parseParts(rest); (Lit(s) :: ps, r)
      case TAct(body) :: rest if body == "end" || body == "else" =>
        (Nil, toks)
      case TAct(body) :: rest if body.startsWith("if ") || body.startsWith("if\t") =>
        val pred = parsePred(body.drop(2).trim)
        val (thenParts, r1) = parseParts(rest)
        r1 match {
          case TAct("else") :: r2 =>
            val (elseParts, r3) = parseParts(r2)
            r3 match {
              case TAct("end") :: r4 =>
                val (ps, r) = parseParts(r4)
                (Cond(pred, Template(thenParts), Template(elseParts)) :: ps, r)
              case _ => throw new ParseError("missing {{end}} after {{else}}")
            }
          case TAct("end") :: r2 =>
            val (ps, r) = parseParts(r2)
            (Cond(pred, Template(thenParts), Template(Nil)) :: ps, r)
          case _ => throw new ParseError("missing {{end}} after {{if}}")
        }
      case TAct(body) :: rest =>
        val (ps, r) = parseParts(rest); (parseRef(body) :: ps, r)
    }

  /** `fn arg arg` with args `.field` or quoted/backticked literals */
  private def parsePred(s: String): Pred = {
    val toks = predTokens(s)
    toks match {
      case fnRaw :: a :: b :: Nil =>
        val fn = fnRaw match {
          case "hasPrefix" | "hasSuffix" | "contains" | "match" | "eq" | "ne" => fnRaw
          case other => throw new ParseError(s"unsupported template predicate: $other")
        }
        Pred(fn, predArg(a), predArg(b))
      case _ => throw new ParseError(s"template predicate needs `fn a b`: $s")
    }
  }

  private def predTokens(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '`') {
        val end = s.indexOf(c, i + 1)
        if (end < 0) throw new ParseError(s"unterminated literal in predicate: $s")
        out += s.substring(i, end + 1)
        i = end + 1
      } else {
        var j = i
        while (j < s.length && !s(j).isWhitespace) j += 1
        out += s.substring(i, j)
        i = j
      }
    }
    out.toList
  }

  private def predArg(t: String): TemplateArg =
    if (t.startsWith(".")) FieldArg(t.drop(1))
    else if (t.length >= 2 && (t.head == '"' || t.head == '`') && t.last == t.head)
      LitArg(t.substring(1, t.length - 1))
    else throw new ParseError(s"template predicate arg must be .field or literal: $t")

  /** `.field`, `.field | ToLower`, `.field | trunc 4 | upper`, … — pipe
    * chains with quoted args (the splitter is quote-aware, so
    * `replace "a|b" "c"` keeps its pipe character)
    */
  private def parseRef(body: String): TemplatePart = {
    val piped = splitPipes(body).map(_.trim)
    if (!piped.head.startsWith("."))
      throw new ParseError(s"unsupported template expr: {{$body}}")
    val field = piped.head.drop(1)
    piped.tail match {
      case Nil => Ref(field)
      case one :: Nil if predTokens(one).length == 1 =>
        Ref(field, templateFn(one)) // single no-arg pipe keeps the slim node
      case pipes =>
        PipedRef(field, pipes.map { p =>
          predTokens(p) match {
            case fn :: args => templatePipe(fn, args.map(unquoteArg))
            case Nil => throw new ParseError(s"empty template pipe in {{$body}}")
          }
        })
    }
  }

  /** split on `|` outside quotes/backticks */
  private def splitPipes(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val sb = new StringBuilder
    var quote: Char = 0
    for (c <- s) {
      if (quote != 0) { sb += c; if (c == quote) quote = 0 }
      else if (c == '"' || c == '`') { sb += c; quote = c }
      else if (c == '|') { out += sb.toString; sb.clear() }
      else sb += c
    }
    out += sb.toString
    out.toList
  }

  private def unquoteArg(t: String): String =
    if (t.length >= 2 && (t.head == '"' || t.head == '`') && t.last == t.head)
      t.substring(1, t.length - 1)
    else t

  private def templateFn(name: String): String = name.toLowerCase match {
    case "tolower" | "lower" => "lower"
    case "toupper" | "upper" => "upper"
    case "trim"              => "trim"
    case "len"               => "len"
    case other => throw new ParseError(s"unsupported template function: $other")
  }

  /** validate an arg-taking (or chained no-arg) pipe */
  private def templatePipe(fn: String, args: List[String]): (String, List[String]) = {
    def intArg(a: String): String =
      if (a.matches("-?\\d+")) a
      else throw new ParseError(s"$fn needs integer args, got '$a'")
    fn.toLowerCase match {
      case f @ ("tolower" | "lower" | "toupper" | "upper" | "trim" | "len") =>
        if (args.nonEmpty) throw new ParseError(s"$f takes no args")
        (templateFn(f), Nil)
      case "trunc" => args match {
        case n :: Nil => ("trunc", List(intArg(n)))
        case _ => throw new ParseError("trunc needs one integer arg")
      }
      case "substr" => args match {
        case a :: b :: Nil => ("substr", List(intArg(a), intArg(b)))
        case _ => throw new ParseError("substr needs two integer args")
      }
      case "replace" => args match {
        case a :: b :: Nil => ("replace", List(a, b))
        case _ => throw new ParseError("replace needs two args")
      }
      case "default" => args match {
        case d :: Nil => ("default", List(d))
        case _ => throw new ParseError("default needs one arg")
      }
      case other => throw new ParseError(s"unsupported template function: $other")
    }
  }
}

private final class LogParser(input: String) {
  import Parser.ParseError
  private var pos = 0

  private def fail(msg: String): Nothing = throw new ParseError(msg)
  private def skipWs(): Unit =
    while (pos < input.length && input(pos).isWhitespace) pos += 1
  private def peek(): Char = { skipWs(); if (pos < input.length) input(pos) else '\u0000' }
  private def eat(c: Char): Boolean = {
    skipWs()
    if (pos < input.length && input(pos) == c) { pos += 1; true } else false
  }
  private def expect(c: Char): Unit =
    if (!eat(c)) fail(s"expected '$c' at $pos in '$input'")

  private def startsWith(s: String): Boolean = {
    skipWs(); input.regionMatches(pos, s, 0, s.length)
  }

  private def ident(): String = {
    skipWs()
    val start = pos
    if (pos < input.length && (input(pos).isLetter || input(pos) == '_')) {
      pos += 1
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
      input.substring(start, pos)
    } else fail(s"expected identifier at $pos in '$input'")
  }

  private def str(): String = {
    skipWs()
    if (pos >= input.length || (input(pos) != '"' && input(pos) != '`'))
      fail(s"expected string at $pos in '$input'")
    val quote = input(pos); pos += 1
    val sb = new StringBuilder
    while (pos < input.length && input(pos) != quote) {
      if (quote == '"' && input(pos) == '\\' && pos + 1 < input.length) {
        pos += 1
        sb += (input(pos) match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'; case c => c
        })
      } else sb += input(pos)
      pos += 1
    }
    if (pos >= input.length) fail("unterminated string")
    pos += 1
    sb.toString
  }

  // ---- entry ---------------------------------------------------------------

  def parseQuery(): LogQuery = {
    val q = parseOneQuery()
    skipWs()
    if (pos < input.length) fail(s"trailing input at $pos: '${input.substring(pos)}'")
    q
  }

  private def parseOneQuery(): LogQuery = {
    skipWs()
    if (peek() == '{') {
      // raw pipeline query
      LogQuery(None, raw = Some(parsePipeline()))
    } else {
      val word = ident()
      if (Ast.vectorOps.contains(word)) parseVectorAgg(word)
      else if (Ast.rangeFns.contains(word)) LogQuery(Some(parseRangeAgg(word)))
      else fail(s"unsupported LogQL function: $word")
    }
  }

  // ---- expression grammar (binops over sample expressions) -----------------

  def parseExprTop(): LogExpr = {
    skipWs()
    // raw pipeline queries stand alone — they are streams, not samples
    val e = if (peek() == '{') LeafQuery(parseOneQuery()) else parseCompare()
    skipWs()
    if (pos < input.length) fail(s"trailing input at $pos: '${input.substring(pos)}'")
    e
  }

  private def parseCompare(): LogExpr = {
    var l = parseAddSub()
    var continue = true
    while (continue) {
      skipWs()
      val op =
        if (input.regionMatches(pos, "==", 0, 2)) "=="
        else if (input.regionMatches(pos, "!=", 0, 2)) "!="
        else if (input.regionMatches(pos, ">=", 0, 2)) ">="
        else if (input.regionMatches(pos, "<=", 0, 2)) "<="
        else if (pos < input.length && input(pos) == '>') ">"
        else if (pos < input.length && input(pos) == '<') "<"
        else ""
      if (op.nonEmpty) { pos += op.length; l = LogBin(op, l, parseAddSub()) }
      else continue = false
    }
    l
  }

  private def parseAddSub(): LogExpr = {
    var l = parseMulDiv()
    var continue = true
    while (continue) {
      skipWs()
      if (pos < input.length && (input(pos) == '+' || input(pos) == '-')) {
        val op = input(pos).toString; pos += 1
        l = LogBin(op, l, parseMulDiv())
      } else continue = false
    }
    l
  }

  private def parseMulDiv(): LogExpr = {
    var l = parseExprOperand()
    var continue = true
    while (continue) {
      skipWs()
      if (pos < input.length &&
        (input(pos) == '*' || input(pos) == '/' || input(pos) == '%')) {
        val op = input(pos).toString; pos += 1
        l = LogBin(op, l, parseExprOperand())
      } else continue = false
    }
    l
  }

  private def parseExprOperand(): LogExpr = {
    skipWs()
    if (pos >= input.length) fail("unexpected end of input")
    val c = input(pos)
    if (c.isDigit || (c == '.' && pos + 1 < input.length && input(pos + 1).isDigit)) {
      val start = pos
      while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
      val lit = input.substring(start, pos)
      NumberLeaf(lit.toDoubleOption.getOrElse(fail(s"malformed number '$lit' at $start")))
    } else if (input.regionMatches(pos, "vector", 0, 6)) {
      // `vector(N)` — the reference's KindVector (a number literal vector,
      // logql/parser.go VectorExpr); arithmetic-equivalent to the bare
      // number in this engine's scalar-broadcast binop rules
      pos += 6
      expect('(')
      skipWs()
      val start = pos
      if (pos < input.length && (input(pos) == '+' || input(pos) == '-')) pos += 1
      while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
      val lit = input.substring(start, pos)
      val v = lit.toDoubleOption.getOrElse(fail(s"malformed number in vector() at $start"))
      expect(')')
      NumberLeaf(v)
    } else if (c == '(') {
      pos += 1
      val e = parseCompare()
      expect(')')
      e
    } else if (c == '{') {
      fail("raw pipeline queries cannot appear in binary expressions")
    } else LeafQuery(parseOneQuery())
  }

  private def eatWord(w: String): Boolean = {
    skipWs()
    if (input.regionMatches(pos, w, 0, w.length)) {
      val end = pos + w.length
      val boundary = end >= input.length ||
        !(input(end).isLetterOrDigit || input(end) == '_')
      if (boundary) { pos = end; true } else false
    } else false
  }

  private def parseVectorAgg(op: String): LogQuery = {
    var by = List.empty[String]
    var without = List.empty[String]
    def grouping(): Unit = {
      if (eatWord("by")) by = labelList()
      else if (eatWord("without")) without = labelList()
    }
    grouping()
    expect('(')
    val param =
      if (op == "topk" || op == "bottomk" || op == "approx_topk") {
        skipWs()
        val start = pos
        while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
        val lit = input.substring(start, pos)
        val p = lit.toDoubleOption.getOrElse(fail(s"malformed number '$lit' at $start"))
        expect(',')
        Some(p)
      } else None
    val fn = ident()
    if (!Ast.rangeFns.contains(fn)) fail(s"expected range aggregation, got $fn")
    val ra = parseRangeAgg(fn)
    expect(')')
    grouping()
    LogQuery(Some(ra), Some(op), by, without, param)
  }

  private def labelList(): List[String] = {
    expect('(')
    val out = scala.collection.mutable.ListBuffer[String]()
    if (!eat(')')) {
      var continue = true
      while (continue) {
        out += ident()
        if (!eat(',')) { expect(')'); continue = false }
      }
    }
    out.toList
  }

  private def parseRangeAgg(fn: String): LogRangeAgg = {
    expect('(')
    // quantile_over_time(q, {sel} ... [5m])
    val param =
      if (fn == "quantile_over_time") {
        skipWs()
        val start = pos
        while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
        val lit = input.substring(start, pos)
        val p = lit.toDoubleOption.getOrElse(fail(s"malformed number '$lit' at $start"))
        expect(',')
        Some(p)
      } else None
    val pipeline = parsePipeline()
    // range attaches after the pipeline: {sel} ... [5m] offset 1h?
    expect('[')
    val start = pos
    while (pos < input.length && input(pos) != ']') pos += 1
    val rangeMs = PParser.parseDurationMs(input.substring(start, pos))
    expect(']')
    var offsetMs = 0L
    if (eatWord("offset")) {
      skipWs()
      // explicit rejection, not a silent sign-flip (and not the opaque
      // "invalid duration:" the unconsumed '-' used to produce): LogQL
      // range offsets are strictly positive here — the PromQL engine is
      // where signed look-ahead offsets are supported
      if (pos < input.length && input(pos) == '-')
        fail(s"negative offset is not supported in LogQL range aggregations (at $pos)")
      val oStart = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '.')) pos += 1
      offsetMs = PParser.parseDurationMs(input.substring(oStart, pos))
    }
    expect(')')
    LogRangeAgg(fn, pipeline, rangeMs, param, offsetMs)
  }

  // ---- pipeline ------------------------------------------------------------

  private def parsePipeline(): LogPipeline = {
    val matchers = parseSelector()
    val stages = scala.collection.mutable.ListBuffer[Stage]()
    var continue = true
    while (continue) {
      skipWs()
      if (startsWith("|=")) {
        pos += 2
        stages += (ipPattern() match {
          case Some(p) => IpLineFilter(negated = false, p)
          case None => LineFilter(LineFilterOp.Contains, str())
        })
      }
      else if (startsWith("!=")) {
        pos += 2
        stages += (ipPattern() match {
          case Some(p) => IpLineFilter(negated = true, p)
          case None => LineFilter(LineFilterOp.NotContains, str())
        })
      }
      else if (startsWith("|~")) { pos += 2; stages += LineFilter(LineFilterOp.Regex, str()) }
      else if (startsWith("!~")) { pos += 2; stages += LineFilter(LineFilterOp.NotRegex, str()) }
      // Loki 3.x pattern line filters: the WHOLE line matches the pattern
      // (`<_>` wildcards only — named captures belong to `| pattern`)
      else if (startsWith("|>")) { pos += 2; stages += LineFilter(LineFilterOp.Pattern, str()) }
      else if (startsWith("!>")) { pos += 2; stages += LineFilter(LineFilterOp.NotPattern, str()) }
      else if (peek() == '|') { pos += 1; stages += parsePipeStage() }
      else continue = false
    }
    LogPipeline(matchers, stages.toList)
  }

  private def parseSelector(): List[Matcher] = {
    expect('{')
    val out = scala.collection.mutable.ListBuffer[Matcher]()
    if (!eat('}')) {
      var continue = true
      while (continue) {
        val label = ident()
        skipWs()
        val op =
          if (startsWith("=~")) { pos += 2; MatchOp.Re }
          else if (startsWith("!~")) { pos += 2; MatchOp.Nre }
          else if (startsWith("!=")) { pos += 2; MatchOp.Ne }
          else if (eat('=')) MatchOp.Eq
          else fail(s"expected matcher op at $pos")
        out += Matcher(label, op, str())
        if (!eat(',')) { expect('}'); continue = false }
      }
    }
    // reference validation: every LogQL selector needs ≥1 equality matcher
    // (queryapi/ddb_harness.go:488-513)
    if (!out.exists(_.op == MatchOp.Eq)) fail("selector requires at least one equality matcher")
    out.toList
  }

  private def parsePipeStage(): Stage = {
    skipWs()
    val word = ident()
    word match {
      case "json" =>
        JsonStage(parseMappings())
      case "logfmt" =>
        LogfmtStage(parseMappings())
      case "regexp" =>
        RegexpStage(str())
      case "pattern" =>
        PatternStage(str())
      case "label_format" =>
        val assigns = scala.collection.mutable.ListBuffer[(String, Template)]()
        var continue = true
        while (continue) {
          val target = ident()
          expect('=')
          skipWs()
          val tmpl =
            if (peek() == '"' || peek() == '`') Parser.parseTemplate(str())
            else Template(List(Ref(ident()))) // bare rename: out=src
          assigns += (target -> tmpl)
          if (!eat(',')) continue = false
        }
        LabelFormatStage(assigns.toList)
      case "line_format" =>
        LineFormatStage(Parser.parseTemplate(str()))
      case "keep" => KeepStage(matcherList())
      case "drop" => DropStage(matcherList())
      case "label_replace" =>
        // stage form of PromQL label_replace (reference logql/parser.go:677);
        // dst/src accept bare idents or quoted names
        expect('(')
        val dst = identOrStr()
        expect(','); val repl = str()
        expect(','); val src = identOrStr()
        expect(','); val regex = str()
        expect(')')
        LabelReplaceStage(dst, repl, src, regex)
      // reference-compat stage keywords (parser.go:677): with a label list
      // they behave as keep/drop; bare they parse as no-ops
      case "keep_labels" =>
        if (peek().isLetter || peek() == '_') KeepStage(matcherList())
        else DropStage(Nil)
      case "drop_labels" =>
        if (peek().isLetter || peek() == '_') DropStage(matcherList())
        else DropStage(Nil)
      case "decolorize" => DecolorizeStage
      case "unpack" => UnpackStage
      case "distinct" => DistinctStage(identList())
      case "unwrap" =>
        skipWs()
        val w = ident()
        if ((w == "duration" || w == "bytes" || w == "duration_seconds") && peek() == '(') {
          expect('(')
          val f = ident()
          expect(')')
          UnwrapStage(f, if (w == "bytes") "bytes" else "duration")
        } else UnwrapStage(w, "")
      case label =>
        // label filter: label op value
        skipWs()
        val op =
          if (startsWith(">=")) { pos += 2; ">=" }
          else if (startsWith("<=")) { pos += 2; "<=" }
          else if (startsWith("==")) { pos += 2; "==" }
          else if (startsWith("!=")) { pos += 2; "!=" }
          else if (startsWith("=~")) { pos += 2; "=~" }
          else if (startsWith("!~")) { pos += 2; "!~" }
          else if (startsWith(">")) { pos += 1; ">" }
          else if (startsWith("<")) { pos += 1; "<" }
          else if (startsWith("=")) { pos += 1; "=" }
          else fail(s"expected label-filter op at $pos")
        skipWs()
        val ipPat = if (op == "=" || op == "!=") ipPattern() else None
        if (ipPat.isDefined) {
          IpLabelFilter(label, negated = op == "!=", ipPat.get)
        } else if (peek() == '"' || peek() == '`') {
          LabelFilter(label, op, str(), numeric = false)
        } else {
          // numeric literal, optionally with duration/bytes unit
          val start = pos
          while (pos < input.length && !input(pos).isWhitespace &&
            input(pos) != '|' && input(pos) != ')' && input(pos) != '[' &&
            input(pos) != ',') pos += 1
          LabelFilter(label, op, input.substring(start, pos), numeric = true)
        }
    }
  }

  /** `ip("pattern")` at the current position → Some(pattern); the pattern
    * is validated at parse time (a malformed IP/CIDR is a query error,
    * like a bad regex). No backtracking needed: a bare `ip` never starts
    * a filter value (values are quoted strings or numbers).
    */
  private def ipPattern(): Option[String] = {
    skipWs()
    if (startsWith("ip(")) {
      pos += 3
      val p = str()
      expect(')')
      // parse-time validation: a malformed IP/CIDR is a query syntax error
      try IpMatch.rangeOf(p)
      catch { case e: IllegalArgumentException => fail(s"bad ip() pattern: ${e.getMessage}") }
      Some(p)
    } else None
  }

  private def identOrStr(): String = {
    skipWs()
    if (pos < input.length && (input(pos) == '"' || input(pos) == '`')) str()
    else ident()
  }

  private def parseMappings(): List[(String, String)] = {
    val out = scala.collection.mutable.ListBuffer[(String, String)]()
    var continue = true
    while (continue) {
      skipWs()
      val save = pos
      if (pos < input.length && (input(pos).isLetter || input(pos) == '_')) {
        val name = ident()
        if (eat('=')) {
          out += (name -> str())
          if (!eat(',')) continue = false
        } else { pos = save; continue = false }
      } else continue = false
    }
    out.toList
  }

  private def identList(): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var continue = true
    while (continue) {
      out += ident()
      if (!eat(',')) continue = false
    }
    out.toList
  }

  /** keep/drop entries: `label` or `label="value"` (equality only) */
  private def matcherList(): List[(String, Option[String])] = {
    val out = scala.collection.mutable.ListBuffer[(String, Option[String])]()
    var continue = true
    while (continue) {
      val l = ident()
      skipWs()
      val v =
        if (pos < input.length && input(pos) == '=') { pos += 1; Some(str()) }
        else None
      out += (l -> v)
      if (!eat(',')) continue = false
    }
    out.toList
  }
}
