package graft.queries

import org.apache.spark.sql.functions._
import graft.expr.Goval
import graft.ops.Dedup
import graft.queries.Queries.t

/**
 * Pipeline-stage operator variants: filter (govaluate translation),
 * flatten (explode semantics incl. includeParent=false and conditional
 * pass-through — /root/reference/internal/processor/processor.go:170-230),
 * dedup strategies first/last/min/max (processor.go:277-314).
 */
object EtlQueries {

  val all: Seq[Q] = Seq(

    // govaluate IN-list + ternary + nested arithmetic.
    Q("q_filter_in_ternary",
      (s, dir) => {
        val pred = Goval.translate(
          "p_size IN (1, 5, 10, 23) && (p_retailprice > (p_size > 9 ? 1500.0 : 900.0))").sql
        t(s, dir, "part").filter(expr(pred))
          .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      },
      Some("""SELECT p_partkey, p_size, p_retailprice FROM part
        WHERE p_size IN (1, 5, 10, 23)
          AND p_retailprice > (CASE WHEN p_size > 9 THEN 1500.0 ELSE 900.0 END)""")),

    // govaluate arithmetic + modulo + regex in one predicate.
    Q("q_filter_arith_regex",
      (s, dir) => {
        val pred = Goval.translate(
          "(l_extendedprice * (1 - l_discount) > 90000) || (l_returnflag =~ 'A' && l_quantity % 7 == 0)",
          stringTyped = Set("l_returnflag")).sql
        t(s, dir, "lineitem").filter(expr(pred))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        WHERE (l_extendedprice * (1 - l_discount) > 90000)
           OR (regexp_matches(l_returnflag, 'A') AND l_quantity % 7 = 0)""")),

    // govaluate DATE LITERALS (parsing.go tryParseTime): a string
    // literal parseable as a date tokenizes to float64 unix seconds, so
    // it compares numerically against an epoch field. The oracle derives
    // the same window independently from the TIMESTAMP column.
    Q("q_filter_date_literal",
      (s, dir) => {
        val pred = Goval.translate(
          "o_epoch >= '1995-06-01' && o_epoch < '1995-09-01 00:00:00'").sql
        t(s, dir, "orders")
          .withColumn("o_epoch", unix_timestamp(col("o_orderdate")))
          .filter(expr(pred))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-06-01'
          AND o_orderdate < TIMESTAMP '1995-09-01'""")),

    // timestamp-TYPED column vs date literal (extension for typed
    // sources: the identifier renders as to_unix_timestamp so it
    // compares on the same epoch-seconds scale as the literal).
    Q("q_filter_ts_literal",
      (s, dir) => {
        val pred = Goval.translate(
          "o_orderdate >= '1995-06-01' && o_orderdate < '1995-09-01'",
          timestampTyped = Map("o_orderdate" -> "timestamp_ntz").get).sql
        t(s, dir, "orders").filter(expr(pred))
          .select(col("o_orderkey"), col("o_custkey"))
      },
      Some("""SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-06-01'
          AND o_orderdate < TIMESTAMP '1995-09-01'""")),

    // flatten with includeParent=false: output holds ONLY the element.
    Q("q_flatten_noparent",
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token")),
      Some("SELECT unnest(string_split(text, ' ')) AS token FROM documents")),

    // conditional flatten: condition not met -> record passes UNflattened.
    Q("q_flatten_conditional",
      (s, dir) => {
        val df = t(s, dir, "documents")
        val flat = df.filter(col("lang") === "en")
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("token"))
        val pass = df.filter(col("lang") =!= "en")
          .select(col("doc_id"), col("lang"), lit(null).cast("string").as("token"))
        flat.unionAll(pass)
      },
      Some("""SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
          FROM documents WHERE lang = 'en'
        UNION ALL
        SELECT doc_id, lang, NULL AS token FROM documents WHERE lang <> 'en'""")),

    // dedup strategy=last (ingest order, multi-key).
    Q("q_dedup_last",
      (s, dir) => Dedup.byIngestOrder(t(s, dir, "events"),
          Seq("user_id", "event_type"), keepFirst = false)
        .select(col("user_id"), col("event_type"), col("event_id")),
      Some("""SELECT user_id, event_type, event_id FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) = 1""")),

    // dedup strategy=min on strategyField (ties -> earliest ingested).
    Q("q_dedup_min",
      (s, dir) => Dedup.byExtreme(t(s, dir, "events"), Seq("user_id"), "value", max = false)
        .select(col("user_id"), col("event_id"), col("value")),
      Some("""SELECT user_id, event_id, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value ASC NULLS FIRST, event_id ASC) = 1""")),

    // dedup strategy=max on strategyField.
    Q("q_dedup_max",
      (s, dir) => Dedup.byExtreme(t(s, dir, "events"), Seq("user_id"), "value", max = true)
        .select(col("user_id"), col("event_id"), col("value")),
      Some("""SELECT user_id, event_id, value FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC NULLS LAST, event_id ASC) = 1""")),

    // dedup min over STRING values — CompareValues semantics
    // (transform.go:1052-1117): numeric strings compare as float64
    // ("9" < "10", never lexicographic), nil is smallest (wins min),
    // non-numeric strings rank above numerics for min.
    Q("q_dedup_min_string",
      (s, dir) => {
        val df = t(s, dir, "events").withColumn("value_str",
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .when(col("event_id") % 7 === 1, lit("abc"))
            .otherwise((col("event_id") % 1000).cast("string")))
        Dedup.byExtreme(df, Seq("user_id"), "value_str", max = false)
          .select(col("user_id"), col("event_id"), col("value_str"))
      },
      Some("""SELECT user_id, event_id, value_str FROM (
          SELECT user_id, event_id,
            CASE WHEN event_id % 7 = 0 THEN NULL
                 WHEN event_id % 7 = 1 THEN 'abc'
                 ELSE CAST(event_id % 1000 AS VARCHAR) END AS value_str
          FROM events)
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY
          CASE WHEN value_str IS NULL THEN 0
               WHEN try_cast(value_str AS DOUBLE) IS NOT NULL THEN 1
               ELSE 2 END ASC,
          try_cast(value_str AS DOUBLE) ASC NULLS LAST,
          CASE WHEN value_str IS NOT NULL AND try_cast(value_str AS DOUBLE) IS NULL
               THEN value_str END ASC NULLS LAST,
          event_id ASC) = 1""")),

    // dedup max over STRING values — nil loses max; non-numeric strings
    // beat numeric ones (strings.Compare: letters sort above digits).
    Q("q_dedup_max_string",
      (s, dir) => {
        val df = t(s, dir, "events").withColumn("value_str",
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .when(col("event_id") % 7 === 1, lit("abc"))
            .otherwise((col("event_id") % 1000).cast("string")))
        Dedup.byExtreme(df, Seq("user_id"), "value_str", max = true)
          .select(col("user_id"), col("event_id"), col("value_str"))
      },
      Some("""SELECT user_id, event_id, value_str FROM (
          SELECT user_id, event_id,
            CASE WHEN event_id % 7 = 0 THEN NULL
                 WHEN event_id % 7 = 1 THEN 'abc'
                 ELSE CAST(event_id % 1000 AS VARCHAR) END AS value_str
          FROM events)
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY
          CASE WHEN value_str IS NULL THEN 0
               WHEN try_cast(value_str AS DOUBLE) IS NOT NULL THEN 1
               ELSE 2 END DESC,
          try_cast(value_str AS DOUBLE) DESC NULLS LAST,
          CASE WHEN value_str IS NOT NULL AND try_cast(value_str AS DOUBLE) IS NULL
               THEN value_str END DESC NULLS LAST,
          event_id ASC) = 1""")),
  )
}
