package graft.operators

import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row/column transforms from the reference's replication path:
  * column hashing with alias/keepSource
  * (glue/sbin/keyspaces/CQLReplicator.scala:879-924),
  * user filter expressions (:1849-1852), field mapping rename+cast
  * (glue/sbin/opensearch/CQLReplicator.scala:84-88), composite key concat
  * (glue/sbin/dynamodb/CQLReplicator.scala:465-467), blob hex rendering
  * (keyspaces:628-639), JSON statement rendering (:815-852), non-PK column
  * compression (:727-757), and large-object offload (:682-725).
  *
  * Everything is a Column/DataFrame combinator so plans stay inside
  * whole-stage codegen; the only JVM-side work is the compression codec,
  * which runs in a typed map over pre-packed binary.
  */
object Transforms {

  /** One hash-transform rule, mirroring the reference's TransformExpression
    * (keyspaces:96). `keepSource=false` replaces the column with the alias.
    */
  final case class HashRule(column: String, rule: String, alias: String,
                            keepSource: Boolean = false)

  /** The reference's hashValue dispatcher (keyspaces:879-896) as native
    * codegen'd expressions — no UDFs.
    */
  def hashColumn(c: Column, rule: String): Column = rule.toLowerCase match {
    case "md5"                                      => md5(c.cast("string"))
    case "sha-1" | "sha1"                           => sha1(c.cast("string"))
    case "sha-2" | "sha2" | "sha-256" | "sha256"    => sha2(c.cast("string"), 256)
    case "xxhash64"                                 => xxhash64(c.cast("string"))
    case "murmurhash3" | "murmur3"                  => hash(c.cast("string"))
    case other => throw new IllegalArgumentException(s"unknown hash rule: $other")
  }

  def applyHashRules(df: DataFrame, rules: Seq[HashRule]): DataFrame =
    rules.foldLeft(df) { (d, r) =>
      val withAlias = d.withColumn(r.alias, hashColumn(col(r.column), r.rule))
      if (r.keepSource || r.column == r.alias) withAlias
      else withAlias.drop(r.column)
    }

  /** OpenSearch-style field mapping: (source, target, targetType) triples
    * applied as a single projection (rename + cast in one select, so column
    * pruning reaches the scan).
    */
  def fieldMapping(df: DataFrame, mapping: Seq[(String, String, String)]): DataFrame =
    df.select(mapping.map { case (src, tgt, tpe) => col(src).cast(tpe).as(tgt) }: _*)

  /** Cassandra→Spark-SQL type mapping, the reference's
    * cassandraTypeToSparkSql (keyspaces/CQLReplicator.scala:1225-1248:
    * what Iceberg CREATE TABLE column defs are rendered from), as a
    * data-driven Column expression so a schema catalog stored AS DATA
    * (how a migration service holds table metadata) maps in one codegen'd
    * projection. Unknown types fall back to STRING, exactly like the
    * reference's `case _`.
    */
  def cqlTypeToSparkSqlType(t: Column): Column = {
    val lt = lower(trim(t))
    when(lt.isin("text", "varchar", "ascii", "inet", "uuid", "timeuuid"), "STRING")
      .when(lt.isin("int", "varint"), "INT")
      .when(lt.isin("bigint", "counter"), "BIGINT")
      .when(lt === "float", "FLOAT")
      .when(lt === "double", "DOUBLE")
      .when(lt === "boolean", "BOOLEAN")
      .when(lt === "timestamp", "TIMESTAMP")
      .when(lt === "date", "DATE")
      .when(lt === "decimal", "DECIMAL(38,19)")
      .when(lt === "smallint", "SMALLINT")
      .when(lt === "tinyint", "TINYINT")
      .when(lt === "blob", "BINARY")
      .otherwise("STRING")
  }

  /** DynamoDB-style composite key: values joined by a separator. */
  def compositeKey(cols: Seq[Column], separator: String = "#"): Column =
    concat_ws(separator, cols.map(_.cast("string")): _*)

  /** Binary rendered as the CQL `0x…` lowercase-hex literal. */
  def blobToHex(c: Column): Column = concat(lit("0x"), lower(hex(c)))

  /** Row rendered as a JSON document (INSERT JSON shape). */
  def rowToJson(cols: Column*): Column = to_json(struct(cols: _*))

  // ----------------------------------------------- value rendering (DDB/CQL)

  /** Canonical string form of a value per the reference's convertDDBValue /
    * convertValue dispatch (glue/sbin/dynamodb/CQLReplicator.scala:157-258):
    * timestamps → epoch-millis strings, dates → ISO strings, booleans →
    * "true"/"false", numerics → their decimal text, blobs → base64. All
    * native codegen'd functions; `cqlType` is the declared source type, as
    * in the reference's column-metadata dispatch.
    */
  def ddbCanonicalString(c: Column, cqlType: String): Column =
    cqlType.toLowerCase match {
      // NTZ parquet timestamps cast through session-TZ (UTC) first
      case "timestamp"                  => unix_millis(c.cast("timestamp")).cast("string")
      case "date"                       => c.cast("date").cast("string")
      case "blob"                       => base64(c)
      case "boolean"                    => c.cast("boolean").cast("string")
      case "decimal"                    => c.cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string")
      case _                            => c.cast("string")
    }

  /** DynamoDB AttributeValue JSON with type tags, the shape
    * createAttributeValue builds (dynamodb:1638-1743): strings → {"S": v},
    * numerics/timestamps → {"N": v}, blobs → {"B": base64}. One
    * `to_json(struct(...))` so the whole rendering is a single codegen'd
    * projection.
    */
  def ddbTypedAttributes(cols: Seq[(String, Column, String)]): Column = {
    val tagged = cols.map { case (name, c, cqlType) =>
      val tag = cqlType.toLowerCase match {
        case "blob"                                         => "B"
        case "boolean"                                      => "BOOL"
        case t if Set("text", "varchar", "ascii", "uuid",
                      "timeuuid", "date")(t)                => "S"
        case _                                              => "N"
      }
      struct(ddbCanonicalString(c, cqlType).as(tag)).as(name)
    }
    to_json(struct(tagged: _*))
  }

  /** Splits a generic type-argument list at the top nesting level only:
    * "text, frozen<list<int>>" → Seq("text", "frozen<list<int>>").
    */
  private def splitTypeArgs(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '<'               => depth += 1
        case '>'               => depth -= 1
        case ',' if depth == 0 => out += args.substring(start, i).trim; start = i + 1
        case _                 =>
      }
      i += 1
    }
    out += args.substring(start).trim
    out.toSeq
  }

  private val CollectionType = "^(list|set|map)<(.*)>$".r
  private val TupleType = "^tuple<(.*)>$".r
  private val UdtType = "^udt<(.*)>$".r

  /** CQL literal rendering per the reference's convertValue/formatString
    * (dynamodb:180-216): strings quoted with `''` escaping, blobs as 0x-hex,
    * timestamps as epoch millis, numerics bare. Collection types recurse per
    * element — per-element quoting like listWithSingleQuotes
    * (parquet/CQLReplicator.scala:593-598: `['a','b']`, elements joined by
    * bare commas) and the map form of convertToMap (parquet:440-442:
    * `{'k':'v', 'k2':'v2'}`, entries joined by ", "); sets use `{}` braces.
    * `frozen<...>` wrappers are transparent. The higher-order `transform`
    * lambdas are interpreted (CodegenFallback) — acceptable on this render
    * path, which is projection-only and shuffle-free.
    */
  def cqlLiteral(c: Column, cqlType: String): Column = {
    val t = cqlType.toLowerCase.trim
    val bare =
      if (t.startsWith("frozen<") && t.endsWith(">"))
        t.stripPrefix("frozen<").stripSuffix(">").trim
      else t
    bare match {
      case CollectionType("list", elem) =>
        concat(lit("["), array_join(transform(c, e => cqlLiteral(e, elem)), ","), lit("]"))
      case CollectionType("set", elem) =>
        concat(lit("{"), array_join(transform(c, e => cqlLiteral(e, elem)), ","), lit("}"))
      case CollectionType("map", kv) =>
        val Seq(keyT, valT) = splitTypeArgs(kv)
        concat(
          lit("{"),
          array_join(transform(map_entries(c), e =>
            concat(cqlLiteral(e.getField("key"), keyT), lit(":"),
              cqlLiteral(e.getField("value"), valT))), ", "),
          lit("}"))
      // CQL tuple literal `(v1,v2,...)`: POSITIONAL struct access (tuples
      // have no field names in CQL; the Spark struct's names are
      // irrelevant), each element recursing on its declared type.
      case TupleType(args) =>
        val elems = splitTypeArgs(args)
        concat(lit("("),
          concat_ws(",", elems.zipWithIndex.map { case (et, i) =>
            cqlLiteral(
              org.apache.spark.sql.graft.GraftExpressions.structFieldAt(c, i), et)
          }: _*),
          lit(")"))
      // CQL UDT literal `{name:v, name2:v2}` (field names unquoted),
      // fields accessed by NAME and recursing on their declared types —
      // `udt<street:text, geo:frozen<tuple<double,double>>>` nests
      // arbitrarily (frozen wrappers transparent at every level).
      case UdtType(args) =>
        val fields = splitTypeArgs(args).map { f =>
          val cut = f.indexOf(':')
          require(cut > 0, s"udt field needs name:type, got: $f")
          (f.substring(0, cut).trim, f.substring(cut + 1).trim)
        }
        concat(lit("{"),
          concat_ws(", ", fields.map { case (n, ft) =>
            concat(lit(n + ":"), cqlLiteral(c.getField(n), ft))
          }: _*),
          lit("}"))
      case "text" | "varchar" | "ascii" | "date" =>
        concat(lit("'"), regexp_replace(ddbCanonicalString(c, bare), "'", "''"), lit("'"))
      case "blob" => blobToHex(c)
      case other  => ddbCanonicalString(c, other)
    }
  }

  /** Optional `USING TTL x [AND TIMESTAMP y]` statement suffix per the
    * reference's processRowWithTTL / processRowWithTimestamp
    * (keyspaces/CQLReplicator.scala:1004-1060): a requested TTL always
    * renders (0 when the source value is null, matching the reference's
    * null→0 fallback), while TIMESTAMP renders only when positive. Leading
    * space included so an absent clause leaves the statement untouched.
    */
  def cqlUsingClause(ttl: Option[Column], writetime: Option[Column]): Column = {
    val ts = writetime.map(w => coalesce(w.cast("long"), lit(0L)))
    (ttl, ts) match {
      case (Some(t), Some(w)) =>
        concat(lit(" USING TTL "), coalesce(t.cast("long"), lit(0L)).cast("string"),
          when(w > 0, concat(lit(" AND TIMESTAMP "), w.cast("string"))).otherwise(lit("")))
      case (Some(t), None) =>
        concat(lit(" USING TTL "), coalesce(t.cast("long"), lit(0L)).cast("string"))
      case (None, Some(w)) =>
        when(w > 0, concat(lit(" USING TIMESTAMP "), w.cast("string"))).otherwise(lit(""))
      case (None, None) => lit("")
    }
  }

  /** Full CQL INSERT statement text, the rowToStatement shape
    * (glue/sbin/parquet/CQLReplicator.scala:600-632), with the optional
    * USING TTL / TIMESTAMP replay suffix (keyspaces:1004-1060).
    */
  def cqlInsertStatement(table: String, cols: Seq[(String, Column, String)],
                         usingTtl: Option[Column] = None,
                         usingTimestamp: Option[Column] = None): Column = {
    val names = cols.map(_._1).mkString(", ")
    val values = cols.map { case (_, c, t) => cqlLiteral(c, t) }
    concat(
      lit(s"INSERT INTO $table ($names) VALUES ("),
      concat_ws(", ", values: _*),
      lit(")"),
      cqlUsingClause(usingTtl, usingTimestamp),
      lit(";"))
  }

  /** JSON-form INSERT statement, the keyspaces replay shape
    * (keyspaces/CQLReplicator.scala:1013 `INSERT INTO t JSON '<row>'
    * $tsSuffix$cas` and :1042/:1054 `INSERT INTO t JSON '<row>'$cas USING
    * TTL n`). The JSON document is `''`-escaped as one string (keyspaces:
    * 839); `USING TIMESTAMP` renders only when the value is positive
    * (getTsValue guard, :1009) while a requested TTL always renders with
    * the null→0 fallback (:1039-1044); `IF NOT EXISTS` appends when
    * read-before-write is on (`cas`, keyspaces:590-593). Faithful to the
    * reference's spacing: the timestamp branch always emits the space
    * after the document, even when the suffix is empty.
    */
  def cqlInsertJsonStatement(table: String, json: Column,
                             usingTtl: Option[Column] = None,
                             usingTimestamp: Option[Column] = None,
                             ifNotExists: Boolean = false): Column = {
    require(usingTtl.isEmpty || usingTimestamp.isEmpty,
      "reference renders either the TTL or the TIMESTAMP form, not both")
    val cas = if (ifNotExists) " IF NOT EXISTS" else ""
    val doc = regexp_replace(json, "'", "''")
    usingTtl match {
      case Some(t) =>
        concat(lit(s"INSERT INTO $table JSON '"), doc, lit(s"'$cas USING TTL "),
          coalesce(t.cast("long"), lit(0L)).cast("string"))
      case None =>
        val ts = usingTimestamp.map(w => coalesce(w.cast("long"), lit(0L)))
          .getOrElse(lit(0L))
        concat(lit(s"INSERT INTO $table JSON '"), doc, lit("' "),
          when(ts > 0, concat(lit("USING TIMESTAMP "), ts.cast("string")))
            .otherwise(lit("")),
          lit(cas))
    }
  }

  /** Primary-key WHERE clause, the rowToStatement shape
    * (glue/sbin/keyspaces/CQLReplicator.scala:1076-1139): `pk=<literal>`
    * conditions joined by ` and `, values quoted per type exactly like the
    * VALUES path (strings `''`-escaped, timestamps as epoch millis,
    * numerics bare).
    */
  def cqlWhereClause(pkCols: Seq[(String, Column, String)]): Column =
    concat_ws(" and ", pkCols.map { case (name, c, t) =>
      concat(lit(s"$name="), cqlLiteral(c, t))
    }: _*)

  /** CQL DELETE statement for the delete-replay path
    * (keyspaces/CQLReplicator.scala:980: `DELETE FROM ks.tbl WHERE <pk>`),
    * composed over the snapshot-diff deletes relation. Projection-only —
    * no shuffle beyond whatever produced the keys.
    */
  def cqlDeleteStatement(table: String, pkCols: Seq[(String, Column, String)]): Column =
    concat(lit(s"DELETE FROM $table WHERE "), cqlWhereClause(pkCols), lit(";"))

  /** Counter-column UPDATE statement (keyspaces/CQLReplicator.scala:926-936:
    * `UPDATE ks.tbl SET c=c+<delta>[,...] WHERE <pk>`). Cassandra counters
    * only accept increments, so the statement renders the aggregated delta
    * per key — the relational half is [[graft.Queries]]' counter_deltas
    * (decimal-summed, order-independent); this is the statement face.
    */
  def cqlCounterUpdateStatement(table: String, counters: Seq[(String, Column)],
                                pkCols: Seq[(String, Column, String)]): Column = {
    val sets = counters.map { case (name, delta) =>
      concat(lit(s"$name=$name+"), delta.cast("long").cast("string"))
    }
    concat(lit(s"UPDATE $table SET "), concat_ws(",", sets: _*),
      lit(" WHERE "), cqlWhereClause(pkCols), lit(";"))
  }

  /** Groups rendered statements into UNLOGGED batches of at most
    * `maxPerBatch`, the FlushingSet shape (keyspaces/CQLReplicator.scala:
    * 210-269, and the `maxStatementsPerBatch > 1` branch at :983-986):
    * statements accumulate in order per work unit (tile) and flush as
    * `BEGIN UNLOGGED BATCH <s1> <s2> … APPLY BATCH;`. Deterministic
    * re-expression of the mutable accumulator: arrival order = rank of
    * `orderCol` within the tile, batch id = (rank-1)/maxPerBatch; the
    * batch text assembles from sorted (rank, stmt) structs so the output
    * is independent of partitioning. One window + one groupBy, both
    * shuffling on the tile — the same key the work was already split by.
    */
  def cqlBatches(stmts: DataFrame, tileCol: Column, orderCol: Column,
                 stmtCol: Column, maxPerBatch: Int): DataFrame = {
    require(maxPerBatch >= 1, "maxPerBatch must be >= 1")
    stmts
      .select(tileCol.as("tile"), orderCol.as("ord"), stmtCol.as("stmt"))
      .withColumn("rn", row_number().over(Window.partitionBy("tile").orderBy("ord")))
      .groupBy(col("tile"),
        ((col("rn") - 1) / maxPerBatch).cast("long").as("batch_id"))
      .agg(
        count(lit(1)).as("n_stmts"),
        concat(lit("BEGIN UNLOGGED BATCH "),
          array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("stmt")))),
            e => e.getField("stmt")), " "),
          lit(" APPLY BATCH;")).as("batch_text"))
  }

  /** Large-object offload: wide column replaced by a deterministic
    * reference key; payloads become their own narrow table keyed by the
    * same reference. The reference uses a random timeuuid (keyspaces:688);
    * a content hash keeps the operator pure and retry-idempotent.
    */
  def offloadColumn(df: DataFrame, lobColumn: String,
                    xrefName: String = "xref"): (DataFrame, DataFrame) = {
    val withRef = df.withColumn(xrefName, md5(col(lobColumn).cast("string")))
    (withRef.drop(lobColumn),
      withRef.select(col(xrefName), col(lobColumn).as("payload")))
  }

  // -------------------------------------------------------------- codec

  /** DEFLATE-compress UTF-8 text (stand-in for the reference's LZ4 pack of
    * non-PK columns; java.util.zip so no extra dependency). Used inside
    * typed maps — keep out of hot aggregation paths.
    */
  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.BEST_SPEED)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](Math.max(64, bytes.length + 64))
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 16)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 16)
    var done = false
    while (!done) {
      val n = inf.inflate(buf)
      out.write(buf, 0, n)
      if (inf.finished()) done = true
      else if (n == 0 && inf.needsInput())
        throw new IllegalStateException("truncated deflate stream")
    }
    inf.end()
    out.toByteArray
  }

  /** Packs `payloadCol` (string) into a compressed binary column named
    * `target`, mirroring compressNonPrimaryColumns (keyspaces:727-757).
    * The codec call is a codegen'd StaticInvoke (not a UDF), so the
    * projection stays inside whole-stage codegen. Distributed per-row map;
    * no state, no shuffle.
    */
  def compressColumn(df: DataFrame, payloadCol: String, target: String): DataFrame =
    df.withColumn(target, org.apache.spark.sql.graft.GraftExpressions.deflate(
      encode(col(payloadCol), "UTF-8")))

  def decompressColumn(df: DataFrame, packedCol: String, target: String): DataFrame =
    df.withColumn(target, decode(
      org.apache.spark.sql.graft.GraftExpressions.inflate(col(packedCol)), "UTF-8"))
}

/** JVM codec entry points for the StaticInvoke expressions (top-level
  * object: the compiler emits static forwarders codegen can call).
  */
object GraftCodec {
  def deflate(bytes: Array[Byte]): Array[Byte] =
    if (bytes == null) null else Transforms.deflate(bytes)
  def inflate(bytes: Array[Byte]): Array[Byte] =
    if (bytes == null) null else Transforms.inflate(bytes)
}
