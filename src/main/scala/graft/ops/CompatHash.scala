package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-compatible reference hashes (opt-in "compat mode").
  *
  * The engine's default series ids and index fingerprints are
  * engine-neutral md5-48 (documented divergence). This module closes the
  * interop gap for deployments that need to read or join against
  * artifacts produced by the reference system:
  *
  *  - [[Fnv1a64]] — FNV-1a 64-bit over UTF-8 bytes, returned as the
  *    SIGNED long the reference stores
  *    (internal/oteltools/pkg/fingerprinter/tid.go:59-66 uses
  *    `hash/fnv`.New64a and `int64(h.Sum64())`). FNV-1a is a public
  *    algorithm (Fowler–Noll–Vo): h₀ = 0xcbf29ce484222325, per byte
  *    h = (h XOR b) * 0x100000001b3, all mod 2^64.
  *  - [[JavaHash64]] — the reference's index fingerprint hash
  *    (internal/fingerprint/fingerprint.go:147-161 `ComputeHash`): the
  *    classic Java-31 polynomial string hash widened to 64 bits,
  *    h = 31·h + byte over UTF-8 bytes (the Go code unrolls 4 bytes per
  *    step; algebraically identical to the sequential fold).
  *
  * Both are native codegen'd expressions (single pass over the
  * UTF8String bytes, no UDF boxing) and are registered in SQL as
  * `fnv1a64` / `java_hash64` by [[graft.GraftExtensions]].
  *
  * On top of them:
  *  - [[CompatHash.tid]] — the reference's TID (time-series id):
  *    FNV-1a over the sorted `key=value|` concatenation of the series
  *    labels + `metric_name` + `chq_metric_type`, skipping null/empty
  *    values (tid.go:70-118 ComputeTID / :153-229 ComputeTIDFromOTEL).
  *  - [[CompatHash.fingerprint]] — the reference's index fingerprint
  *    `ComputeHash(field + ":" + token)` (fingerprint.go:141-145), with
  *    [[CompatHash.trigrams]] reproducing its rune-boundary trigram set
  *    (fingerprint.go:119-139 toTrigrams) as code-point substrings.
  *
  * Correctness: known-answer vectors for both hashes in
  * CompatHashSpec (public FNV-1a test vectors), a property cross-check
  * against independent driver-side folds, and two driver-gated rows
  * (`tq_tid_compat`, `tq_fp_compat`) whose DuckDB oracles re-derive the
  * hashes independently via HUGEINT mod-2^64 `list_reduce` arithmetic.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "fnv1a64"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 needs a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    CompatHash.fnv1a64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.CompatHash.fnv1a64($c)")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

case class JavaHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "java_hash64"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"java_hash64 needs a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    CompatHash.javaHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.CompatHash.javaHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): JavaHash64 =
    copy(child = newChild)
}

object CompatHash {

  // ---- byte-level folds (shared by interpreted eval and codegen) ----------

  def fnv1a64(s: UTF8String): Long = fnv1a64Bytes(s.getBytes)

  def fnv1a64Bytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def javaHash64(s: UTF8String): Long = javaHash64Bytes(s.getBytes)

  def javaHash64Bytes(b: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < b.length) {
      h = 31 * h + (b(i) & 0xffL)
      i += 1
    }
    h
  }

  // ---- Column wrappers ----------------------------------------------------

  def fnv1a64(c: Column): Column =
    ColumnBridge.column(Fnv1a64(ColumnBridge.expression(c)))

  def javaHash64(c: Column): Column =
    ColumnBridge.column(JavaHash64(ColumnBridge.expression(c)))

  // ---- reference TID (tid.go ComputeTID / ComputeTIDFromOTEL) -------------

  /** Reference-exact TID for a metric series. `labels` carry their FINAL
    * row-key names (the caller prefixes `attr_` / `resource_` the way the
    * reference's row builder does); `metric_name` and `chq_metric_type`
    * are appended here. All kvs are sorted by key, serialized `k=v|`,
    * null/empty values skipped (tid.go:77-80), then FNV-1a'd.
    */
  def tid(metricName: Column, metricType: Column,
      labels: Seq[(String, Column)]): Column = {
    // Go sorts label keys with strings.Compare = byte order over UTF-8
    // (tid.go:97-99); Scala String ordering is UTF-16 code-unit order.
    // They diverge for supplementary-plane keys vs U+E000..U+FFFF, so
    // compare the keys' UTF-8 bytes unsigned (ADVICE r12).
    val kvs = (labels ++ Seq("metric_name" -> metricName,
      "chq_metric_type" -> metricType)).sortWith { (p, q) =>
      java.util.Arrays.compareUnsigned(
        p._1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        q._1.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    }
    val terms = kvs.map { case (k, v) =>
      val s = v.cast("string")
      when(s.isNotNull && s =!= "", concat(lit(k + "="), s, lit("|")))
        .otherwise(lit(""))
    }
    fnv1a64(concat(terms: _*))
  }

  // ---- reference index fingerprints (fingerprint.go) ----------------------

  /** `ComputeFingerprint(field, token)` = ComputeHash(field ":" token). */
  def fingerprint(field: Column, token: Column): Column =
    javaHash64(concat(field, lit(":"), token))

  /** The `field exists` fingerprint: token is the literal ".*"
    * (fingerprint.go ExistsRegex). */
  def existsFingerprint(field: Column): Column =
    fingerprint(field, lit(".*"))

  /** Rune-boundary trigram set of a string column
    * (fingerprint.go:119-139 toTrigrams): every 3-code-point substring
    * starting at each code point, deduplicated; strings shorter than 3
    * code points yield an empty set. Spark `substring` is code-point
    * based, matching Go's rune slicing byte-for-byte after UTF-8
    * re-encoding.
    */
  def trigrams(s: Column): Column = {
    val n = length(s)
    array_distinct(
      when(n >= 3,
        transform(sequence(lit(1), n - lit(2)), i => s.substr(i, lit(3))))
        .otherwise(array().cast("array<string>")))
  }

  /** All index fingerprints for one (field, value) pair under the
    * reference's `IndexTrigramExact` policy: the exists fingerprint, the
    * exact-value fingerprint, and one per trigram — as an array column.
    */
  def trigramExactFingerprints(field: Column, value: Column): Column = {
    val tri = transform(trigrams(value), t => fingerprint(field, t))
    array_union(array(existsFingerprint(field), fingerprint(field, value)), tri)
  }

  // ---- reference span fingerprints (oteltools fingerprinter/spans.go) -----

  /** XXH64 (seed 0) of a string column as the SIGNED long the reference
    * stores — `int64(xxhash.Sum64String(s))`. Bit contract held by
    * [[FingerprintCompat.xxh64]] (pinned against the reference's three
    * published fingerprints); registered in SQL as `xxh64` by
    * [[graft.GraftExtensions]].
    */
  def xxh64(c: Column): Column =
    ColumnBridge.column(Xxh64Str(ColumnBridge.expression(c)))

  /** Reference-exact span fingerprint
    * (spans.go:51-87 CalculateSpanFingerprint / :95- FromRow):
    * xxh64 over the `##`-joined attribute list
    * [cluster|"unknown", namespace|"unknown", service|"unknown", kind]
    * plus the FIRST matching branch —
    * messaging.system → [system, operation.type, destination.name];
    * db.system.name   → [span name, system, namespace, operation.name,
    *                     server.address, collection.name];
    * http.request.method → [method, url.template];
    * otherwise         → [span name].
    * Absent/null attributes participate as EMPTY strings (Go's
    * strings.Join keeps empty parts — `a####b` is meaningful), while the
    * three resource attrs default to "unknown". Branch tests are
    * non-empty-string tests, exactly the Go guards.
    */
  def spanFingerprint(
      clusterName: Column, namespaceName: Column, serviceName: Column,
      spanKind: Column, spanName: Column,
      messagingSystem: Column = lit(""), messagingOperationType: Column = lit(""),
      messagingDestinationName: Column = lit(""),
      dbSystem: Column = lit(""), dbNamespace: Column = lit(""),
      dbOperationName: Column = lit(""), serverAddress: Column = lit(""),
      dbCollectionName: Column = lit(""),
      httpRequestMethod: Column = lit(""), urlTemplate: Column = lit("")): Column = {
    def orUnknown(c: Column): Column =
      when(coalesce(c, lit("")) === "", lit("unknown")).otherwise(c)
    def orEmpty(c: Column): Column = coalesce(c, lit(""))
    val base = Seq(orUnknown(clusterName), orUnknown(namespaceName),
      orUnknown(serviceName), orEmpty(spanKind))
    def joined(extra: Seq[Column]): Column =
      concat_ws("##", (base ++ extra.map(orEmpty)): _*)
    val payload =
      when(orEmpty(messagingSystem) =!= "",
        joined(Seq(messagingSystem, messagingOperationType, messagingDestinationName)))
        .when(orEmpty(dbSystem) =!= "",
          joined(Seq(spanName, dbSystem, dbNamespace, dbOperationName,
            serverAddress, dbCollectionName)))
        .when(orEmpty(httpRequestMethod) =!= "",
          joined(Seq(httpRequestMethod, urlTemplate)))
        .otherwise(joined(Seq(spanName)))
    xxh64(payload)
  }
}

/** XXH64 (seed 0) of a string's UTF-8 bytes as a signed long — the
  * reference's span-fingerprint / fingerprinter hash
  * (xxhash.Sum64String; algorithm is public XXH64). Single-pass native
  * expression; bit-exactness pinned in FingerprintCompatSpec /
  * CompatHashSpec.
  */
case class Xxh64Str(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "xxh64"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"xxh64 needs a string child, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    FingerprintCompat.xxh64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.ops.FingerprintCompat.xxh64($c.getBytes(), 0L)")

  override protected def withNewChildInternal(newChild: Expression): Xxh64Str =
    copy(child = newChild)
}
