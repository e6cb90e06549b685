package graft.sources

import graft.QueryDef
import graft.analytics.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet ingestion faces: training corpora arrive as JSONL at least
  * as often as parquet, and operational exports arrive as CSV. These
  * queries prove the SAME rows flow through those formats — each stages a
  * deterministic derivation of the driver's parquet testdata (single
  * sorted file, fixed field order, once per (input dir, format)), reads it
  * back with an EXPLICIT schema (never inference in production paths) plus
  * a corrupt-record channel, and aggregates; the DuckDB oracle reads the
  * very same staged file with its own JSONL/CSV reader, so the format
  * round-trip — serialization, parsing, typing — is hash-gated
  * cross-engine, not assumed.
  *
  * Unlike [[graft.OracleStage]] (Verify-only), staging here is
  * unconditional: reading the format IS the operator, so Bench must time
  * the real JSONL/CSV scan. The one-time write lands in a query's first
  * bench rep; medians sit on the later reps.
  *
  * Scale: a single staged file is a gate-corpus convenience — the read
  * path (schema'd DataFrameReader over a directory) is exactly what a
  * 100 TB JSONL lake uses, splittable per file; aggregation shapes are the
  * engine's usual partial-agg group-bys.
  */
object FormatSources {

  val Root: String = new java.io.File("target/format_stage").getAbsolutePath

  private val staged = scala.collection.mutable.Set.empty[String]

  private def key(d: String): String =
    d.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "")

  /** Stage documents as ONE sorted JSONL file; returns the directory. */
  def documentsJsonl(s: SparkSession, d: String): String = synchronized {
    val dir = s"$Root/${key(d)}/documents_jsonl"
    if (staged.add(dir) && !new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).sortWithinPartitions("doc_id")
        .write.mode("overwrite").json(dir)
    }
    dir
  }

  /** Stage events as ONE sorted headered CSV (ts at second precision as a
    * string — both engines then parse the identical text); returns the dir.
    */
  def eventsCsv(s: SparkSession, d: String): String = synchronized {
    val dir = s"$Root/${key(d)}/events_csv"
    if (staged.add(dir) && !new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.events(s, d)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("user_id"), col("event_type"))
        .coalesce(1).sortWithinPartitions("event_id")
        .write.mode("overwrite").option("header", "true").csv(dir)
    }
    dir
  }

  /** Stage lineitem's analytic columns as ORC (Spark-native columnar
    * alternative to parquet — zlib, sorted single file); returns the dir.
    */
  def lineitemOrc(s: SparkSession, d: String): String = synchronized {
    val dir = s"$Root/${key(d)}/lineitem_orc"
    if (staged.add(dir) && !new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
          "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
        .coalesce(1).sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite").option("compression", "zlib").orc(dir)
    }
    dir
  }

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt", StringType)))

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  val defs: Seq[QueryDef] = Seq(

    // ----- JSONL corpus ingestion (explicit schema + corrupt channel) ---
    QueryDef(
      "q_source_jsonl_docs",
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(SUM(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         |                                x -> len(x) > 0))) AS BIGINT) AS sum_tokens
         |FROM read_json('$Root/__KEY__/documents_jsonl/*.json',
         |               format='newline_delimited',
         |               columns={'doc_id':'BIGINT', 'text':'VARCHAR', 'lang':'VARCHAR',
         |                        'source':'VARCHAR', 'n_chars':'BIGINT'})
         |GROUP BY lang, source
         |ORDER BY lang, source""".stripMargin) { (s, d) =>
      val dir = documentsJsonl(s, d)
      val docs = s.read.schema(docsSchema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(dir)
      // corrupt rows must be impossible on our own serialization — surface
      // them as a hard failure, not a silently-smaller aggregate
      docs.filter(col("_corrupt").isNotNull)
        .limit(1).collect().headOption.foreach { r =>
          throw new IllegalStateException(s"corrupt JSONL row: ${r.getString(5)}")
        }
      docs
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
            .as("sum_tokens"))
        .orderBy("lang", "source")
    },

    // ----- ORC fact ingestion (Spark-native columnar, zlib) -------------
    // The third lake format: operational exports and Hive-era warehouses
    // ship ORC. Spark's reader is built in; DuckDB has none — so the
    // oracle aggregates the SOURCE parquet with the identical SQL, and
    // the hash match proves the parquet→ORC→scan round-trip preserved
    // every value (decimal money, dates, strings, keys) through the
    // different encoder/decoder stack, not just that ORC "reads".
    QueryDef(
      "q_source_orc_lineitem",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(MIN(l_shipdate) AS DATE) AS first_ship,
        |       CAST(MAX(l_shipdate) AS DATE) AS last_ship,
        |       COUNT(*) AS n_items,
        |       COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val dir = lineitemOrc(s, d)
      val l = s.read.orc(dir)
      val disc = expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))")
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(expr("CAST(l_quantity AS DECIMAL(18,2))")).cast("double").as("sum_qty"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).cast("double").as("sum_base_price"),
          sum(disc).cast("double").as("sum_disc_price"),
          min(col("l_shipdate")).cast("date").as("first_ship"),
          max(col("l_shipdate")).cast("date").as("last_ship"),
          count(lit(1)).as("n_items"),
          countDistinct("l_orderkey").as("n_orders"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ----- CSV event ingestion (explicit schema, headered) --------------
    QueryDef(
      "q_source_csv_events",
      s"""SELECT event_type, COUNT(*) AS n_events,
         |       COUNT(DISTINCT user_id) AS n_users,
         |       MIN(ts) AS first_ts, MAX(ts) AS last_ts
         |FROM read_csv('$Root/__KEY__/events_csv/*.csv', header=true,
         |              columns={'event_id':'BIGINT', 'ts':'VARCHAR',
         |                       'user_id':'BIGINT', 'event_type':'VARCHAR'})
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val dir = eventsCsv(s, d)
      s.read.schema(eventsSchema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          min("ts").as("first_ts"), max("ts").as("last_ts"))
        .orderBy("event_type")
    })

  /** The oracle SQL above contains a `__KEY__` placeholder because the
    * staged path depends on the input dir, which QueryDef's static SQL
    * cannot know. [[graft.Verify]] resolves it for the sfDir it is
    * dumping, so the oracle always reads the exact files the Spark side
    * staged for that run.
    */
  def resolveOracle(sfDir: String, sql: String): String =
    sql.replace("__KEY__", key(sfDir))
}
