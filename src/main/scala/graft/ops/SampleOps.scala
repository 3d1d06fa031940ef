package graft.ops

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}
import graft.core.Tables.orderedByAll
import graft.sample.Sampling

/** Deterministic-sampling operator inventory (the LLM-pipeline
  * curation stage): hash-Bernoulli subsample, per-source mixture
  * weights, and stratified per-group quotas — every keep/drop
  * decision a pure function of (key, seed), replayed exactly by the
  * DuckDB oracles.
  */
object SampleOps {

  private val Rate = 0.25
  private val Quota = 10
  private val Mix = Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.1)

  /** The oracle-side CASE mirroring [[Sampling.mixture]]'s threshold
    * column — built from the same rateThreshold values so the two
    * engines compare against identical hex constants.
    */
  private val mixCase = Mix.toSeq.sortBy(_._1).reverse
    .map { case (s, r) => s"WHEN '$s' THEN '${Sampling.rateThreshold(r)}'" }
    .mkString("CASE source ", " ", " ELSE '0000' END")

  val defs: Seq[QueryDef] = Seq(
    // X1 deterministic Bernoulli sample: ~25% of documents by key
    // hash. A pure filter — no shuffle, no rand(), identical under
    // task retry and across engines.
    QueryDef(
      "x1_hash_sample",
      (s, d) => orderedByAll(
        Sampling.bernoulli(Tables.documents(s, d), col("doc_id"), Rate, "s1")
          .select("doc_id", "source")),
      Some(s"""SELECT doc_id, source FROM documents
              |WHERE substring(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 4)
              |      < '${Sampling.rateThreshold(Rate)}'
              |ORDER BY ALL""".stripMargin)
    ),
    // X2 stratified quota: exactly 10 docs per source, chosen by hash
    // order — the "n docs per domain" cap. One shuffle on the group
    // key; quota applied by the window, never a collect.
    QueryDef(
      "x2_stratified_sample",
      (s, d) => orderedByAll(
        Sampling.stratified(Tables.documents(s, d),
            Seq(col("source")), col("doc_id"), Quota, "s2")
          .select("doc_id", "source")),
      Some(s"""SELECT doc_id, source FROM (
              |  SELECT doc_id, source, row_number() OVER (
              |    PARTITION BY source
              |    ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || 's2'), 1, 4), doc_id
              |  ) AS rn FROM documents)
              |WHERE rn <= $Quota ORDER BY ALL""".stripMargin)
    ),
    // X3 mixture weights: per-source keep rates (80% of src0, 50% of
    // src1, 10% of src2, everything else dropped) — the dataset-
    // mixture stage of a training pipeline, still one codegen'd
    // filter against a CASE of hex thresholds.
    QueryDef(
      "x3_mixture_weights",
      (s, d) => orderedByAll(
        Sampling.mixture(Tables.documents(s, d), col("doc_id"),
            col("source"), Mix, "s3")
          .select("doc_id", "source")),
      Some(s"""SELECT doc_id, source FROM documents
              |WHERE substring(md5(CAST(doc_id AS VARCHAR) || 's3'), 1, 4) < $mixCase
              |ORDER BY ALL""".stripMargin)
    ),
    // X4 sessionization: per-user sessions with a 30-minute gap via
    // Spark's native session_window (the same expression streams
    // under a watermark — StreamingSpec). Oracle replays the
    // semantics as gaps-and-islands over integer micros: break when
    // the gap to the previous event is >= 30 min, cumulative-sum the
    // breaks into session ids. Value sums ride DECIMAL so the
    // shuffle-order-free result is exact.
    QueryDef(
      "x4_sessionize",
      (s, d) => orderedByAll(
        graft.temporal.Sessions.sessionize(
            Tables.events(s, d), col("user_id"), col("ts"), "30 minutes",
            Seq(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .as("__sv")))
          .select(col("user_id"),
            unix_micros(col("session_start")).as("session_start_us"),
            unix_micros(col("session_end")).as("session_end_us"),
            col("n_events"),
            col("__sv").cast("double").as("total_value"))),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
             |o AS (SELECT user_id, us, value,
             |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
             |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 1800000000
             |       THEN 1 ELSE 0 END AS brk FROM e),
             |s AS (SELECT user_id, us, value, sum(brk) OVER (
             |  PARTITION BY user_id ORDER BY us
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM o)
             |SELECT user_id, min(us) AS session_start_us,
             |       max(us) + 1800000000 AS session_end_us,
             |       count(*) AS n_events,
             |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM s GROUP BY user_id, sid ORDER BY ALL""".stripMargin)
    ),
    // X7 distributional quality gate: drop each source's shortest-10%
    // tail — the per-group percentile-threshold filter a curation
    // pipeline runs before training. The threshold is the EXACT
    // k-th-smallest value per group (k = ceil(0.1·n), rank arithmetic
    // over ints with a doc_id tiebreak) — deliberately NOT the
    // interpolated percentile, whose float interpolation differs
    // across engines in the last ulp (the reason a13 rounds): a
    // threshold must be bit-portable or boundary rows flip. One
    // window pass builds the per-source threshold table (|sources|
    // rows), which broadcasts back onto the corpus — the corpus side
    // never shuffles.
    QueryDef(
      "x7_quantile_gate",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("n_chars", "doc_id")
        val th = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")))
          .where(col("rn") === ceil(col("cnt") * 0.1).cast("long"))
          .select(col("source"), col("n_chars").as("p10"))
        orderedByAll(
          Tables.documents(s, d)
            .join(broadcast(th), "source")
            .where(col("n_chars") >= col("p10"))
            .select(col("doc_id"), col("source"), col("n_chars")))
      },
      Some("""WITH r AS (SELECT source, doc_id, n_chars,
             |        row_number() OVER (PARTITION BY source
             |                           ORDER BY n_chars, doc_id) AS rn,
             |        count(*) OVER (PARTITION BY source) AS cnt
             |      FROM documents),
             |th AS (SELECT source, n_chars AS p10 FROM r
             |       WHERE rn = CAST(ceil(cnt * 0.1) AS BIGINT))
             |SELECT d.doc_id, d.source, d.n_chars
             |FROM documents d JOIN th USING (source)
             |WHERE d.n_chars >= th.p10 ORDER BY ALL""".stripMargin)
    ),
    // X8 behavioral feature extraction — the per-entity ML feature
    // pass: one keyed aggregate computing event volume, per-type
    // counts (conditional sums — a static pivot, no second shuffle),
    // active-day cardinality, span, and an exact DECIMAL value total.
    // ONE shuffle on user_id produces the whole feature vector; at
    // 100 TB this is the map-side-combine-friendly shape (every
    // feature is an algebraic aggregate).
    QueryDef(
      "x8_user_features",
      (s, d) => {
        def typed(t: String) =
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
        orderedByAll(
          Tables.events(s, d)
            .groupBy("user_id")
            .agg(count(lit(1)).as("n_events"),
              typed("click"), typed("purchase"), typed("error"),
              countDistinct(to_date(col("ts"))).as("active_days"),
              (max(unix_micros(col("ts"))) -
                min(unix_micros(col("ts")))).as("span_us"),
              sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
                .cast("double").as("total_value")))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
             |  count(DISTINCT CAST(ts AS DATE)) AS active_days,
             |  max(epoch_us(ts)) - min(epoch_us(ts)) AS span_us,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY user_id ORDER BY ALL""".stripMargin)
    ),
    // X10 weighted sampling without replacement (Efraimidis–Spirakis
    // A-Res): top-10 orders per priority group with inclusion
    // probability ∝ price — the quality/length-weighted subsampling
    // stage `mixture` rates can't express. The exponential jitter
    // derives from 52 EXACT md5 bits (hash-determinism contract:
    // retries and oracle engines draw the same sample); the oracle
    // replays the identical -ln((hex52+1)/2^52+1)/w arithmetic.
    QueryDef(
      "x10_weighted_sample",
      (s, d) => orderedByAll(
        Sampling.weighted(Tables.orders(s, d), Seq(col("o_orderpriority")),
            col("o_orderkey"), col("o_totalprice"), 10, "x10")
          .select(col("o_orderpriority").as("grp"),
            col("o_orderkey").as("k"), col("o_totalprice").as("w"))),
      Some("""WITH s AS (
             |  SELECT o_orderkey AS k, o_orderpriority AS grp, o_totalprice AS w,
             |         -ln((CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR) || 'x10'), 1, 13)) AS BIGINT) + 1)
             |             / 4503599627370497.0) / o_totalprice AS ej
             |  FROM orders WHERE o_totalprice > 0),
             |r AS (SELECT grp, k, w,
             |        row_number() OVER (PARTITION BY grp ORDER BY ej ASC, k ASC) AS rn
             |      FROM s)
             |SELECT grp, k, w FROM r WHERE rn <= 10 ORDER BY ALL""".stripMargin)
    ),
    // X11 robust outlier gate (Robust.madOutliers): median/MAD
    // flagging per order priority — the outlier stage that adapts to
    // each group's own spread where x7 trims a fixed percentile.
    // Median = value AT rank ceil(n/2) (never interpolated), MAD =
    // the same exact rank over |v − med|; the flag compares one
    // subtraction against one multiplication — all algebraic, the
    // oracle replays every bit. Dump restricted to flagged rows.
    QueryDef(
      "x11_mad_outliers",
      (s, d) => orderedByAll(
        graft.sample.Robust.madOutliers(Tables.orders(s, d),
            col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            k = 1.8)
          .where(col("is_outlier"))
          .select(col("key"), col("id"), col("v"), col("med"), col("mad"))),
      Some("""WITH b AS (SELECT o_orderpriority AS key, o_orderkey AS id,
             |                 o_totalprice AS v FROM orders),
             |r1 AS (SELECT key, id, v,
             |         row_number() OVER (PARTITION BY key ORDER BY v, id) AS rn,
             |         count(*) OVER (PARTITION BY key) AS n
             |       FROM b),
             |med AS (SELECT key, v AS med FROM r1
             |        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)),
             |dev AS (SELECT b.key, b.id, b.v, med.med, abs(b.v - med.med) AS dv
             |        FROM b JOIN med USING (key)),
             |r2 AS (SELECT key, id, dv,
             |         row_number() OVER (PARTITION BY key ORDER BY dv, id) AS rn,
             |         count(*) OVER (PARTITION BY key) AS n
             |       FROM dev),
             |mad AS (SELECT key, dv AS mad FROM r2
             |        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT))
             |SELECT dev.key, dev.id, dev.v, dev.med, mad.mad
             |FROM dev JOIN mad USING (key)
             |WHERE dev.dv > 1.8 * mad.mad ORDER BY ALL""".stripMargin)
    ),
    // X12 token-budgeted mixture (Sampling.tokenBudget): per source,
    // docs in deterministic md5 order until the running TOKEN total
    // reaches the budget — the "N tokens per source" mix primitive
    // (x2 caps rows; data mixes specify tokens). The implementation
    // is the skew-safe two-phase prefix sum (hash-prefix bucket sums,
    // then within-bucket exact running sums); the oracle states the
    // FLAT per-source running-sum definition, so the hash match IS
    // the proof the two-phase decomposition is exact.
    QueryDef(
      "x12_token_budget",
      (s, d) => orderedByAll(
        graft.sample.Sampling.tokenBudget(
          Tables.documents(s, d), col("source"), col("doc_id"),
          size(graft.text.TextFunctions.tokens(col("text"))).cast("long"),
          budget = 600L, seed = "mix1")),
      Some("""WITH t AS (SELECT source, doc_id AS id,
             |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens,
             |         md5(CAST(doc_id AS VARCHAR) || 'mix1') AS h
             |       FROM documents),
             |c AS (SELECT source, id, n_tokens,
             |        CAST(sum(n_tokens) OVER (
             |          PARTITION BY source ORDER BY h, id) AS BIGINT) AS cum_tokens
             |      FROM t)
             |SELECT source, id, n_tokens, cum_tokens FROM c
             |WHERE cum_tokens <= 600 ORDER BY ALL""".stripMargin)
    ),
    // X13 deterministic train/val/test split (Sampling.split): the
    // one-time labeled assignment as a pure hash expression — no
    // shuffle, retry-stable, membership re-derivable anywhere from
    // (key, seed). 80/10/10; fractions quantize at 1/65536 (the
    // shared threshold resolution), and the oracle replays the same
    // cumulative-threshold CASE over the same md5 prefix.
    QueryDef(
      "x13_hash_split",
      (s, d) => orderedByAll(
        graft.sample.Sampling.split(
          Tables.documents(s, d).select("doc_id", "source"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = "sp1")),
      Some({
        val t = (c: Double) => graft.sample.Sampling.rateThreshold(c)
        s"""SELECT doc_id, source,
           |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'sp1'), 1, 4)
           |         < '${t(0.8)}' THEN 'train'
           |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'sp1'), 1, 4)
           |         < '${t(0.9)}' THEN 'val'
           |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || 'sp1'), 1, 4)
           |         < '${t(1.0)}' THEN 'test'
           |       ELSE 'rest' END AS split
           |FROM documents ORDER BY ALL""".stripMargin
      })
    )
  )
}
