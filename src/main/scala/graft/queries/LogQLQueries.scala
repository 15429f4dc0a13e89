package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Cooked
import graft.logql.{Compiler, LogStore, Parser => LParser}
import graft.promql.QueryParams

/** LogQL engine coverage: real LogQL strings through parser → staged
  * pipeline compiler (→ synthetic-metric rewrite + PromQL engine for
  * aggregations), over cooked logs derived from `events`, each with a
  * DuckDB oracle.
  */
object LogQLQueries extends Catalog {
  private val Start = 1704067200000L
  private val End = Start + 14L * 86400000L
  private val StepMs = 3600000L
  private val P = QueryParams(Start, End, StepMs)
  private val BigLimit = 10000000 // exceed row count → set semantics for compare

  private def raw(logql: String, fields: Seq[String])(s: SparkSession, d: String): DataFrame = {
    val q = LParser.parse(logql).fold(e => throw new IllegalArgumentException(e), identity)
    Compiler.rawQuery(q.raw.get, LogStore(Cooked.logs(s, d)), Start, End, BigLimit,
      desc = true, fields = fields)
  }

  private def agg(logql: String)(s: SparkSession, d: String): DataFrame =
    Compiler.query(logql, LogStore(Cooked.logs(s, d)), P)
      .filter(!isnan(col("value")))

  private val timeCond = s"chq_timestamp >= $Start AND chq_timestamp < $End"

  /** step CTE over cooked logs: per (1h bucket, group label) partial aggs of
    * a derived per-line value expr; scan extended left by the range like the
    * engine's leaf.
    */
  private def logStep(where: String, groupLabel: String, valueExpr: String,
      rangeMs: Long): String =
    s"""${Cooked.logsCte},
     stepl AS (
       SELECT chq_timestamp - chq_timestamp % $StepMs AS ts, $groupLabel,
              sum($valueExpr) AS bsum,
              CAST(count(*) AS DOUBLE) AS bcnt,
              min($valueExpr) AS bmin, max($valueExpr) AS bmax
       FROM logs
       WHERE ($where) AND chq_timestamp >= ${Start - rangeMs}
         AND chq_timestamp < $End
       GROUP BY 1, 2)"""

  private def logWin(rangeMs: Long, groupLabel: String): String =
    s"""win AS (
       SELECT ts, $groupLabel,
              sum(bsum) OVER w AS wsum, sum(bcnt) OVER w AS wcnt,
              min(bmin) OVER w AS wmin, max(bmax) OVER w AS wmax,
              min(ts) OVER w AS first_ts
       FROM stepl
       WINDOW w AS (PARTITION BY $groupLabel ORDER BY ts
                    RANGE BETWEEN ${rangeMs - StepMs} PRECEDING AND CURRENT ROW))"""

  private def covered(rangeMs: Long): String =
    s"first_ts = ts - ${rangeMs - StepMs} AND ts >= $Start AND ts < $End"

  private val H4 = 4L * 3600000L

  // absence window: spans the sparse tail AND past the end of the 30-day
  // events table (the pq_absent_over_time convention)
  private val AbsStart = Start + 21L * 86400000L
  private val AbsEnd = Start + 35L * 86400000L

  override def all: Seq[Q] = Seq(
    Q("lq_raw_lines",
      raw("""{log_level="ERROR"} |= "evt=error" """,
        Seq("chq_timestamp", "chq_tsns", "log_message", "resource_service_name")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp, chq_tsns, log_message, resource_service_name
        FROM logs
        WHERE log_level = 'ERROR' AND contains(log_message, 'evt=error')
          AND $timeCond""")),

    Q("lq_line_filters",
      raw("""{log_level="DEBUG"} |= "evt=click" != "user=1 " |~ "value=1[0-9]{2}\." """,
        Seq("chq_timestamp", "log_message")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp, log_message FROM logs
        WHERE log_level = 'DEBUG'
          AND contains(log_message, 'evt=click')
          AND NOT contains(log_message, 'user=1 ')
          AND regexp_matches(log_message, 'value=1[0-9]{2}\\.')
          AND $timeCond""")),

    Q("lq_logfmt_labelfilter",
      raw("""{log_level="DEBUG"} | logfmt | evt="click" | user > 5 """,
        Seq("chq_timestamp", "evt", "user")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp,
               regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1) AS evt,
               regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS "user"
        FROM logs
        WHERE log_level = 'DEBUG'
          AND regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1) = 'click'
          AND TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS DOUBLE) > 5
          AND $timeCond""")),

    Q("lq_regexp_stage",
      raw("""{log_level="INFO"} | regexp "evt=(?P<etype>[a-z]+) user=(?P<uid>[0-9]+)" | etype="purchase" """,
        Seq("chq_timestamp", "etype", "uid")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp,
               regexp_extract(log_message, 'evt=([a-z]+) user=([0-9]+)', 1) AS etype,
               regexp_extract(log_message, 'evt=([a-z]+) user=([0-9]+)', 2) AS uid
        FROM logs
        WHERE log_level = 'INFO'
          AND regexp_extract(log_message, 'evt=([a-z]+) user=([0-9]+)', 1) = 'purchase'
          AND $timeCond""")),

    Q("lq_label_format",
      raw("""{log_level="ERROR"} | logfmt | label_format tag="{{.evt}}-{{.log_level}}", svc_up="{{.resource_service_name | ToUpper}}" """,
        Seq("chq_timestamp", "tag", "svc_up")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp,
               regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1)
                 || '-' || log_level AS tag,
               upper(resource_service_name) AS svc_up
        FROM logs WHERE log_level = 'ERROR' AND $timeCond""")),

    // keep/drop narrow the label set carried to the output (fields=Nil so
    // the default projection exposes exactly the surviving labels)
    // Loki pattern parser: literal template with <name> captures; BOTH
    // engines run the same compiled regex, so parity is structural
    Q("lq_pattern_stage",
      raw("""{log_level="INFO"} | pattern `evt=<evt> user=<uid> value=<val> props=<_>` | uid != "" """,
        Seq("chq_timestamp", "evt", "uid", "val")),
      Some {
        val (re, _) = graft.logql.Compiler.patternToRegex(
          "evt=<evt> user=<uid> value=<val> props=<_>")
        s"""WITH ${Cooked.logsCte}
          SELECT chq_timestamp,
                 regexp_extract(log_message, '$re', 1) AS evt,
                 regexp_extract(log_message, '$re', 2) AS uid,
                 regexp_extract(log_message, '$re', 3) AS val
          FROM logs
          WHERE log_level = 'INFO'
            AND regexp_extract(log_message, '$re', 2) <> ''
            AND $timeCond"""
      }),

    Q("lq_keep_drop",
      raw("""{log_level="ERROR"} | logfmt | keep evt, user | drop user """,
        Nil),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp, chq_tsns, log_message,
               regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1) AS evt
        FROM logs WHERE log_level = 'ERROR' AND $timeCond""")),

    // binop between two aggregations (reference KindBinOp): per-service
    // ERROR-line share per hourly bucket. range == step pins coverage, the
    // inner join on (ts, service) mirrors full-tag vector matching, and the
    // division takes two exact integer-valued doubles — bit-stable.
    Q("lq_binop_ratio",
      agg(s"""sum by (resource_service_name) (count_over_time({log_level="ERROR"}[${StepMs}ms]))"""
        + s""" / sum by (resource_service_name) (count_over_time({metric_name="log_events"}[${StepMs}ms]))"""),
      Some(s"""WITH ${Cooked.logsCte},
        le AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 resource_service_name, CAST(count(*) AS DOUBLE) AS v
          FROM logs WHERE log_level = 'ERROR' AND $timeCond GROUP BY 1, 2),
        ra AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 resource_service_name, CAST(count(*) AS DOUBLE) AS v
          FROM logs WHERE $timeCond GROUP BY 1, 2)
        SELECT le.ts, le.resource_service_name, le.v / ra.v AS value
        FROM le JOIN ra USING (ts, resource_service_name)
        WHERE le.ts >= $Start AND le.ts < $End""")),

    // binop vs scalar: comparison filter keeps buckets above a threshold
    Q("lq_binop_threshold",
      agg(s"""sum by (attr_event_type) (count_over_time({log_level="DEBUG"}[${StepMs}ms])) > 1"""),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
               attr_event_type, CAST(count(*) AS DOUBLE) AS value
        FROM logs WHERE log_level = 'DEBUG' AND $timeCond
        GROUP BY 1, 2 HAVING count(*) > 1""")),

    // range offset (reference LogRange.Offset, logql/parser.go:113): the
    // scan window shifts left by the offset and emitted buckets shift back
    Q("lq_offset_count",
      agg("""sum by (attr_event_type) (count_over_time({log_level="DEBUG"}[4h] offset 1d))"""),
      Some(s"""WITH ${Cooked.logsCte},
        stepl AS (
          SELECT (chq_timestamp + 86400000) - (chq_timestamp + 86400000) % $StepMs AS ts,
                 attr_event_type, CAST(count(*) AS DOUBLE) AS bsum
          FROM logs
          WHERE log_level = 'DEBUG'
            AND chq_timestamp >= ${Start - H4 - 86400000L}
            AND chq_timestamp < ${End - 86400000L}
          GROUP BY 1, 2),
        win AS (
          SELECT ts, attr_event_type, sum(bsum) OVER w AS wsum,
                 min(ts) OVER w AS first_ts
          FROM stepl
          WINDOW w AS (PARTITION BY attr_event_type ORDER BY ts
                       RANGE BETWEEN ${H4 - StepMs} PRECEDING AND CURRENT ROW))
        SELECT ts, attr_event_type, wsum AS value
        FROM win WHERE ${covered(H4)}""")),

    // label_replace as a pipeline stage (reference logql/parser.go:677):
    // full-match group substitution creates svc_id from the service label,
    // a later filter consumes the new label
    Q("lq_label_replace",
      raw("""{log_level="INFO"} | label_replace(svc_id, "id-$1", resource_service_name, "svc-(.*)") | svc_id != "id-0" """,
        Seq("chq_timestamp", "resource_service_name", "svc_id")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp, resource_service_name,
               'id-' || regexp_extract(resource_service_name, '^svc-(.*)$$', 1)
                 AS svc_id
        FROM logs
        WHERE log_level = 'INFO'
          AND 'id-' || regexp_extract(resource_service_name, '^svc-(.*)$$', 1)
              <> 'id-0'
          AND $timeCond""")),

    // conditional templates + trim/len pipes (reference template compiler
    // logql/sql_builder.go:636-953)
    Q("lq_label_format_cond",
      raw("""{metric_name="log_events", log_level=~"ERROR|INFO"} | logfmt | label_format kind=`{{if hasPrefix "p" .evt}}buy{{else}}other{{end}}`, flagged=`{{if contains "rr" .log_level}}y{{end}}`, svclen="{{.resource_service_name | len}}", evt_t="{{.evt | trim}}" """,
        Seq("chq_timestamp", "kind", "flagged", "svclen", "evt_t")),
      Some(s"""WITH ${Cooked.logsCte},
        x AS (SELECT chq_timestamp, log_level, resource_service_name,
                     regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1) AS evt
              FROM logs
              WHERE regexp_full_match(log_level, 'ERROR|INFO') AND $timeCond)
        SELECT chq_timestamp,
               CASE WHEN starts_with(evt, 'p') THEN 'buy' ELSE 'other' END AS kind,
               CASE WHEN contains(log_level, 'rr') THEN 'y' ELSE '' END AS flagged,
               CAST(length(resource_service_name) AS VARCHAR) AS svclen,
               trim(evt) AS evt_t
        FROM x""")),

    Q("lq_line_format",
      raw("""{log_level="INFO"} | logfmt | line_format "u{{.user}} did {{.evt}}" |= "did purchase" """,
        Seq("chq_timestamp", "log_message")),
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp,
               'u' || regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1)
                 || ' did ' || regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1)
                 AS log_message
        FROM logs
        WHERE log_level = 'INFO'
          AND contains('u' || regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1)
                 || ' did ' || regexp_extract(log_message, '(?:^|\\s)evt=([^\\s]+)', 1),
               'did purchase')
          AND $timeCond""")),

    Q("lq_json_stage",
      { (s, d) =>
        val q = LParser.parse("""{log_level="DEBUG"} | json | k > 50 """)
          .fold(e => throw new IllegalArgumentException(e), identity)
        Compiler.rawQuery(q.raw.get, LogStore(Cooked.logsJson(s, d)), Start, End,
          BigLimit, desc = true, fields = Seq("chq_timestamp", "k"))
      },
      Some(s"""WITH ${Cooked.logsJsonCte}
        SELECT chq_timestamp, json_extract_string(log_message, '$$.k') AS k
        FROM logsj
        WHERE log_level = 'DEBUG'
          AND TRY_CAST(json_extract_string(log_message, '$$.k') AS DOUBLE) > 50
          AND $timeCond""")),

    Q("lq_drop_conditional",
      raw("""{log_level="DEBUG"} | logfmt | drop user="1" """,
        Seq("chq_timestamp", "log_message", "user")),
      // value-conditional drop: the user label is nulled ONLY on rows
      // where it equals "1"; the line and the column itself survive
      Some(s"""WITH ${Cooked.logsCte},
        x AS (SELECT chq_timestamp, log_message,
                regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS u
              FROM logs WHERE log_level = 'DEBUG' AND $timeCond)
        SELECT chq_timestamp, log_message,
               CASE WHEN u = '1' THEN NULL ELSE u END AS "user"
        FROM x""")),

    Q("lq_absent_over_time",
      { (s, d) =>
        Compiler.query("""absent_over_time({attr_event_type="signup"}[4h])""",
          LogStore(Cooked.logs(s, d)),
          QueryParams(AbsStart, AbsEnd, StepMs))
          .filter(!isnan(col("value")))
      },
      // 1 on grid buckets whose [4h] window contains no signup line — the
      // log-absence alerting probe riding the PromQL engine's anti
      // range-join against the broadcast presence set
      Some(s"""WITH ${Cooked.logsCte},
        pres AS (
          SELECT DISTINCT chq_timestamp - chq_timestamp % $StepMs AS ts
          FROM logs
          WHERE attr_event_type = 'signup'
            AND chq_timestamp >= ${AbsStart - H4} AND chq_timestamp < $AbsEnd)
        SELECT r.range AS ts, 1.0 AS value
        FROM range($AbsStart, $AbsEnd, $StepMs) r
        WHERE NOT EXISTS (
          SELECT 1 FROM pres s
          WHERE s.ts BETWEEN r.range - ${H4 - StepMs} AND r.range)""")),

    Q("lq_template_pipes",
      raw("{log_level=\"INFO\"} | logfmt | label_format " +
        "a=\"{{.resource_service_name | trunc 4}}\", " +
        "b=`{{.attr_event_type | replace \"u\" \"U\"}}`, " +
        "c=\"{{.resource_service_name | substr 4 5}}\", " +
        "e=\"{{.attr_event_type | upper | trunc 3}}\", " +
        "d=`{{.missing_key | default \"none\"}}`",
        Seq("chq_timestamp", "a", "b", "c", "e", "d")),
      // sprig-convention pipes: trunc = first n chars, substr = [a,b)
      // 0-based, replace = literal replace-all, default fires on "", and
      // chains apply left to right; missing_key is logfmt-extracted to ""
      // (need-key analysis), so default engages on every line
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp,
               left(resource_service_name, 4) AS a,
               replace(attr_event_type, 'u', 'U') AS b,
               substr(resource_service_name, 5, 1) AS c,
               left(upper(attr_event_type), 3) AS e,
               'none' AS d
        FROM logs
        WHERE log_level = 'INFO' AND $timeCond""")),

    Q("lq_error_label",
      { (s, d) =>
        // mixed store: every 3rd user's line is logfmt (invalid JSON), the
        // rest carry the JSON props payload — `| json` tags the failures
        val ev = graft.model.Tables.events(s, d)
        val mixed = ev.select(
          col("ts_ms").as("chq_timestamp"),
          (col("ts_ms") * lit(1000000L)).as("chq_tsns"),
          when(col("event_type") === "error", "ERROR").otherwise("DEBUG")
            .as("log_level"),
          when(col("user_id") % 3 === 0,
            concat(lit("evt="), col("event_type"),
              lit(" user="), col("user_id").cast("string")))
            .otherwise(col("props")).as("log_message"))
        val q = LParser.parse("""{log_level="DEBUG"} | json | __error__ = "JSONParserErr" """)
          .fold(e => throw new IllegalArgumentException(e), identity)
        Compiler.rawQuery(q.raw.get, LogStore(mixed), Start, End, BigLimit,
          desc = true, fields = Seq("chq_timestamp", "log_message", "__error__"))
      },
      // Loki parity: parse failures keep flowing with __error__ set (graft
      // materializes it only when referenced — need-key gating); the oracle
      // derives the same mixed lines and selects the invalid-JSON ones
      Some(s"""WITH m AS (
          SELECT epoch_ms(ts) AS chq_timestamp,
                 CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'DEBUG' END
                   AS log_level,
                 CASE WHEN user_id % 3 = 0
                      THEN 'evt=' || event_type || ' user=' || CAST(user_id AS VARCHAR)
                      ELSE props END AS log_message
          FROM events)
        SELECT chq_timestamp, log_message, 'JSONParserErr' AS "__error__"
        FROM m
        WHERE log_level = 'DEBUG' AND NOT json_valid(log_message)
          AND $timeCond""")),

    Q("lq_pattern_filter",
      raw("""{log_level="DEBUG"} |> "evt=click user=<_> value=1<_>" !> "evt=click user=1<_>" """,
        Seq("chq_timestamp", "log_message")),
      // whole-line pattern match: <_> → non-greedy wildcard, literals
      // escaped, anchored both ends — the oracle runs the same regexes
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp, log_message FROM logs
        WHERE log_level = 'DEBUG'
          AND regexp_matches(log_message, '^evt=click user=.*? value=1.*?$$')
          AND NOT regexp_matches(log_message, '^evt=click user=1.*?$$')
          AND $timeCond""")),

    Q("lq_unpack",
      { (s, d) =>
        val q = LParser.parse("""{log_level="ERROR"} | unpack | svc = "svc-3" """)
          .fold(e => throw new IllegalArgumentException(e), identity)
        Compiler.rawQuery(q.raw.get, LogStore(Cooked.logsPacked(s, d)), Start, End,
          BigLimit, desc = true, fields = Seq("chq_timestamp", "log_message", "svc"))
      },
      // unpack(pack(line)) is the identity on the line and the promoted svc
      // label equals the field it was packed from — the oracle computes the
      // expected output directly from the UNPACKED fields, so the whole
      // Spark-side JSON round-trip (to_json → get_json_object) is under test
      Some(s"""WITH ${Cooked.logsCte}
        SELECT chq_timestamp, log_message, resource_service_name AS svc
        FROM logs
        WHERE log_level = 'ERROR' AND resource_service_name = 'svc-3'
          AND $timeCond""")),

    Q("lq_distinct",
      raw("""{log_level="INFO"} | distinct attr_event_type """,
        Seq("chq_timestamp", "log_message", "attr_event_type")),
      // first line per distinct label value inside the queried window;
      // (chq_tsns, line) ordering replayed verbatim
      Some(s"""WITH ${Cooked.logsCte},
        r AS (SELECT chq_timestamp, log_message, attr_event_type,
                row_number() OVER (PARTITION BY attr_event_type
                  ORDER BY chq_tsns, log_message) AS rn
              FROM logs WHERE log_level = 'INFO' AND $timeCond)
        SELECT chq_timestamp, log_message, attr_event_type FROM r WHERE rn = 1""")),

    Q("lq_count_over_time",
      agg("""sum by (resource_service_name) (count_over_time({attr_event_type="click"}[4h]))"""),
      Some(s"""WITH ${logStep("attr_event_type = 'click'", "resource_service_name", "1.0", H4)},
        ${logWin(H4, "resource_service_name")}
        SELECT ts, resource_service_name, wsum AS value
        FROM win WHERE ${covered(H4)}""")),

    Q("lq_rate",
      agg("""sum by (resource_service_name) (rate({attr_event_type="click"}[4h]))"""),
      Some(s"""WITH ${logStep("attr_event_type = 'click'", "resource_service_name", "1.0", H4)},
        ${logWin(H4, "resource_service_name")}
        SELECT ts, resource_service_name, wsum / ${H4 / 1000.0} AS value
        FROM win WHERE ${covered(H4)}""")),

    Q("lq_bytes_over_time",
      agg("""sum by (attr_event_type) (bytes_over_time({log_level="DEBUG"}[4h]))"""),
      Some(s"""WITH ${logStep("log_level = 'DEBUG'", "attr_event_type",
          "CAST(strlen(log_message) AS DOUBLE)", H4)},
        ${logWin(H4, "attr_event_type")}
        SELECT ts, attr_event_type, wsum AS value
        FROM win WHERE ${covered(H4)}""")),

    Q("lq_bytes_rate",
      agg("""sum by (attr_event_type) (bytes_rate({log_level="DEBUG"}[4h]))"""),
      Some(s"""WITH ${logStep("log_level = 'DEBUG'", "attr_event_type",
          "CAST(strlen(log_message) AS DOUBLE)", H4)},
        ${logWin(H4, "attr_event_type")}
        SELECT ts, attr_event_type, wsum / ${H4 / 1000.0} AS value
        FROM win WHERE ${covered(H4)}""")),

    Q("lq_rate_counter",
      agg("""sum by (attr_event_type) (rate_counter({log_level="DEBUG"} | logfmt | unwrap user [4h]))"""),
      Some(s"""WITH ${logStep("log_level = 'DEBUG'", "attr_event_type",
          "TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS DOUBLE)", H4)},
        ${logWin(H4, "attr_event_type")}
        SELECT ts, attr_event_type, wsum / ${H4 / 1000.0} AS value
        FROM win WHERE ${covered(H4)}""")),

    Q("lq_unwrap_sum",
      agg("""sum by (attr_event_type) (sum_over_time({log_level="DEBUG"} | logfmt | unwrap user [4h]))"""),
      Some(s"""WITH ${logStep("log_level = 'DEBUG'", "attr_event_type",
          "TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS DOUBLE)", H4)},
        ${logWin(H4, "attr_event_type")}
        SELECT ts, attr_event_type, wsum AS value
        FROM win WHERE ${covered(H4)}""")),

    Q("lq_unwrap_avg",
      agg("""avg_over_time({log_level="INFO"} | logfmt | unwrap user [4h])"""),
      // no vector agg → series labels = all pipeline labels
      Some(s"""WITH ${Cooked.logsCte},
        stepl AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 log_level, resource_service_name, attr_event_type,
                 TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS DOUBLE) AS u
          FROM logs
          WHERE log_level = 'INFO' AND chq_timestamp >= ${Start - H4}
            AND chq_timestamp < $End),
        stepa AS (
          SELECT ts, log_level, resource_service_name, attr_event_type,
                 sum(u) AS bsum, CAST(count(u) AS DOUBLE) AS bcnt
          FROM stepl WHERE u IS NOT NULL GROUP BY 1, 2, 3, 4),
        win AS (
          SELECT ts, log_level, resource_service_name, attr_event_type,
                 sum(bsum) OVER w AS wsum, sum(bcnt) OVER w AS wcnt,
                 min(ts) OVER w AS first_ts
          FROM stepa
          WINDOW w AS (PARTITION BY log_level, resource_service_name, attr_event_type
                       ORDER BY ts RANGE BETWEEN ${H4 - StepMs} PRECEDING AND CURRENT ROW))
        SELECT ts, log_level, resource_service_name, attr_event_type,
               wsum / wcnt AS value
        FROM win WHERE ${covered(H4)} AND wcnt > 0""")),

    Q("lq_ip_filter",
      // Loki's ip() filter, line AND label forms: a deterministic src IP is
      // injected from chq_id hex octets (the corpus has no dotted quads, so
      // the injected address is the only candidate), then the line filter
      // CIDR-prunes to second-octet < 128 and the post-logfmt label filter
      // narrows to < 64. The oracle replays the identical octet arithmetic.
      { (s, d) =>
        val inj = Cooked.logs(s, d).withColumn("log_message", concat(
          col("log_message"), lit(" src=10."),
          conv(substring(col("chq_id"), 1, 2), 16, 10), lit("."),
          conv(substring(col("chq_id"), 3, 2), 16, 10), lit(".7")))
        val q = LParser.parse(
          """{log_level="INFO"} |= ip("10.0.0.0/9") | logfmt | src = ip("10.0.0.0/10")""")
          .fold(e => throw new IllegalArgumentException(e), identity)
        Compiler.rawQuery(q.raw.get, LogStore(inj), Start, End, BigLimit,
          desc = true, fields = Seq("chq_id", "src"))
      },
      Some(s"""WITH inj AS (
        SELECT substr(md5(CAST(event_id AS VARCHAR)), 1, 20) AS chq_id,
               CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2) AS INT) AS BIGINT) AS o1,
               CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 3, 2) AS INT) AS BIGINT) AS o2
        FROM events
        WHERE epoch_ms(ts) >= $Start AND epoch_ms(ts) < $End
          AND event_type IN ('purchase', 'signup'))
        SELECT chq_id,
               '10.' || CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.7' AS src
        FROM inj WHERE o1 < 64""")),

    Q("lq_stdvar_over_time",
      agg("""stdvar_over_time({log_level="INFO"} | logfmt | unwrap user [4h])"""),
      // population variance over the window's bucket gauge values (bucket
      // averages) via the engine's ORDERED FOLD for Σv/Σv² (see
      // pq_stddev_over_time: window-SUM frame-walk order is engine-internal
      // and the n·Σv²−(Σv)² cancellation amplifies its ulp noise) —
      // replayed as a recursive CTE over the ts-ordered window list. The
      // fold inputs are the engine's cents-quantized bucket averages with
      // the irrational-offset floor (see the Engine stddev arm).
      Some(s"""WITH RECURSIVE ${Cooked.logsCte},
        stepl AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 log_level, resource_service_name, attr_event_type,
                 TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS DOUBLE) AS u
          FROM logs
          WHERE log_level = 'INFO' AND chq_timestamp >= ${Start - H4}
            AND chq_timestamp < $End),
        stepa AS (
          SELECT ts, log_level, resource_service_name, attr_event_type,
                 floor(sum(u) / CAST(count(u) AS DOUBLE) * 100
                       + CAST(0.31830988618367446 AS DOUBLE)) / 100.0 AS v
          FROM stepl WHERE u IS NOT NULL GROUP BY 1, 2, 3, 4),
        wnd AS (
          SELECT ts, log_level, resource_service_name, attr_event_type,
                 list(v) OVER w AS vs, min(ts) OVER w AS first_ts
          FROM stepa
          WINDOW w AS (PARTITION BY log_level, resource_service_name, attr_event_type
                       ORDER BY ts RANGE BETWEEN ${H4 - StepMs} PRECEDING AND CURRENT ROW)),
        base AS (
          SELECT ts, log_level, resource_service_name, attr_event_type, vs
          FROM wnd WHERE ${covered(H4)}),
        f AS (
          SELECT ts, log_level, resource_service_name, attr_event_type, vs,
                 0 AS i, CAST(0 AS DOUBLE) AS sv, CAST(0 AS DOUBLE) AS svv
          FROM base
          UNION ALL
          SELECT ts, log_level, resource_service_name, attr_event_type, vs,
                 i + 1, sv + vs[i + 1], svv + vs[i + 1] * vs[i + 1]
          FROM f WHERE i < len(vs))
        SELECT ts, log_level, resource_service_name, attr_event_type,
               (CAST(len(vs) AS DOUBLE) * svv - sv * sv)
                 / (CAST(len(vs) AS DOUBLE) * CAST(len(vs) AS DOUBLE)) AS value
        FROM f WHERE i = len(vs)""")),

    Q("lq_first_over_time",
      agg("""first_over_time({log_level="INFO"} | logfmt | unwrap user [4h])"""),
      // first = the window's earliest step bucket's avg unwrapped value
      Some(s"""WITH ${Cooked.logsCte},
        stepl AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 log_level, resource_service_name, attr_event_type,
                 TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1) AS DOUBLE) AS u
          FROM logs
          WHERE log_level = 'INFO' AND chq_timestamp >= ${Start - H4}
            AND chq_timestamp < $End),
        stepa AS (
          SELECT ts, log_level, resource_service_name, attr_event_type,
                 sum(u) AS bsum, CAST(count(u) AS DOUBLE) AS bcnt
          FROM stepl WHERE u IS NOT NULL GROUP BY 1, 2, 3, 4),
        win AS (
          SELECT ts, log_level, resource_service_name, attr_event_type,
                 first_value(bsum / CASE WHEN bcnt = 0 THEN 1.0 ELSE bcnt END)
                   OVER w AS fv,
                 min(ts) OVER w AS first_ts
          FROM stepa
          WINDOW w AS (PARTITION BY log_level, resource_service_name, attr_event_type
                       ORDER BY ts RANGE BETWEEN ${H4 - StepMs} PRECEDING AND CURRENT ROW))
        SELECT ts, log_level, resource_service_name, attr_event_type, fv AS value
        FROM win WHERE ${covered(H4)}""")),

    // LogQL quantile over unwrapped values: synthetic DDSketch metric →
    // engine sketch leaf; oracle replays the sketch quantile read (see
    // pq_hist_quantile) over the same unwrapped values
    Q("lq_quantile_over_time",
      { (s, d) =>
        agg("""quantile_over_time(0.9, {log_level="INFO"} | logfmt | user > 0 | unwrap user [4h])""")(s, d)
          .withColumn("value", round(col("value"), 6))
      },
      Some {
        val g = "((1.0 + 0.01) / (1.0 - 0.01))"
        val labs = "log_level, resource_service_name, attr_event_type"
        s"""WITH ${Cooked.logsCte},
        ev AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS b, $labs,
                 TRY_CAST(regexp_extract(log_message, '(?:^|\\s)user=([^\\s]+)', 1)
                          AS DOUBLE) AS v
          FROM logs
          WHERE log_level = 'INFO' AND chq_timestamp >= ${Start - H4}
            AND chq_timestamp < $End),
        ev2 AS (SELECT * FROM ev WHERE v IS NOT NULL AND v > 0),
        win AS (
          SELECT b + o.o * $StepMs AS ts, $labs, v, b
          FROM ev2 CROSS JOIN range(0, ${H4 / StepMs}) o(o)),
        stats AS (
          SELECT ts, $labs, CAST(count(*) AS BIGINT) AS n,
                 min(v) AS mn, max(v) AS mx, min(b) AS first_b
          FROM win GROUP BY 1, 2, 3, 4),
        idx AS (
          SELECT ts, $labs, CAST(ceil(ln(v) / ln($g)) AS BIGINT) AS i,
                 count(*) AS c
          FROM win GROUP BY 1, 2, 3, 4, 5),
        cum AS (
          SELECT ts, $labs, i,
                 sum(c) OVER (PARTITION BY ts, $labs ORDER BY i) AS cum
          FROM idx),
        sel AS (
          SELECT c.ts, c.log_level, c.resource_service_name, c.attr_event_type,
                 min(c.i) AS qi
          FROM cum c JOIN stats s USING (ts, $labs)
          WHERE c.cum >= CAST(floor(0.9 * (s.n - 1)) AS BIGINT) + 1
          GROUP BY 1, 2, 3, 4),
        anchors AS (SELECT DISTINCT b AS ts, $labs FROM ev2)
        SELECT s.ts, s.log_level, s.resource_service_name, s.attr_event_type,
               round(least(greatest(2 * pow($g, qi) / ($g + 1.0), s.mn), s.mx), 6)
                 AS value
        FROM sel JOIN stats s USING (ts, $labs)
        JOIN anchors USING (ts, $labs)
        WHERE s.first_b = s.ts - ${H4 - StepMs}
          AND s.ts >= $Start AND s.ts < $End"""
      }),

    Q("lq_topk",
      agg("""topk(2, count_over_time({attr_event_type="purchase"}[1h]))"""),
      Some(s"""WITH ${Cooked.logsCte},
        stepl AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 log_level, resource_service_name, attr_event_type,
                 CAST(count(*) AS DOUBLE) AS v
          FROM logs
          WHERE attr_event_type = 'purchase' AND $timeCond
          GROUP BY 1, 2, 3, 4),
        rk AS (
          SELECT ts, log_level, resource_service_name, attr_event_type, v,
                 row_number() OVER (PARTITION BY ts ORDER BY v DESC,
                   log_level || ' ' || resource_service_name || ' ' || attr_event_type ASC) AS rn
          FROM stepl)
        SELECT ts, log_level, resource_service_name, attr_event_type, v AS value
        FROM rk WHERE rn <= 2""")),

    Q("lq_approx_topk",
      // Loki 3.1's experimental approx_topk name — graft answers it
      // EXACTLY (the two-phase salted rank already bounds every task), so
      // the oracle is the same exact rank the topk row replays
      agg("""approx_topk(2, count_over_time({attr_event_type="purchase"}[1h]))"""),
      Some(s"""WITH ${Cooked.logsCte},
        stepl AS (
          SELECT chq_timestamp - chq_timestamp % $StepMs AS ts,
                 log_level, resource_service_name, attr_event_type,
                 CAST(count(*) AS DOUBLE) AS v
          FROM logs
          WHERE attr_event_type = 'purchase' AND $timeCond
          GROUP BY 1, 2, 3, 4),
        rk AS (
          SELECT ts, log_level, resource_service_name, attr_event_type, v,
                 row_number() OVER (PARTITION BY ts ORDER BY v DESC,
                   log_level || ' ' || resource_service_name || ' ' || attr_event_type ASC) AS rn
          FROM stepl)
        SELECT ts, log_level, resource_service_name, attr_event_type, v AS value
        FROM rk WHERE rn <= 2"""))
  )
}
