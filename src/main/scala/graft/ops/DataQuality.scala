package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-level data-quality checking (Deequ-style constraint sweep)
  * and integer-exact histograms — the validation pass a pipeline runs
  * before committing a snapshot to training.
  *
  * Scale notes (100 TB): every rule is a `sum(when(violation, 1))`
  * aggregate, so ALL rules evaluate in ONE full scan with map-side
  * partial combine (adding a rule adds a column, not a pass); the
  * histogram is one hash aggregation on an integer bin key. Counts are
  * integers — engine-exact. */
object DataQuality {

  /** One row per rule: (rule, n_violations, n_rows). A rule's column
    * is the VIOLATION predicate (true/non-null-true = bad row). */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"__v_$i")
      }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v_$i").as("n_violations"),
        col("__n").as("n_rows"))
    }
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Fixed-width histogram over `valueExpr` scaled to integer units
    * (`round(v * 10^scaleDigits)`): bin = `units div binUnits`,
    * integral arithmetic only, so bin membership is engine-exact
    * (float `floor(v / width)` could land boundary values in different
    * bins per engine). Returns (bin, lo, n, sum_units) for non-empty
    * bins. */
  def histogram(df: DataFrame, valueExpr: Column, binUnits: Long,
                scaleDigits: Int = 2): DataFrame = {
    require(binUnits > 0, "binUnits must be positive")
    val unit = math.pow(10, scaleDigits)
    val units = round(valueExpr.cast("double") * lit(unit)).cast("long")
    df.select(units.as("__u")).filter(col("__u").isNotNull)
      // FLOOR division (pmod-adjusted — `div` truncates toward zero,
      // which would disagree with SQL `//` on negative values)
      .select(expr(s"(__u - pmod(__u, $binUnits)) div $binUnits").as("bin"),
        col("__u"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__u")).as("sum_units"))
      .select(col("bin"), (col("bin") * binUnits).as("lo_units"),
        col("n"), col("sum_units"))
  }

  /** k-anonymity / l-diversity audit: group rows by the quasi-identifier
    * combination and summarize re-identification risk — the privacy
    * gate a dataset passes before release:
    *
    *   n_groups_lt_k / n_rows_lt_k — equivalence classes (and the rows
    *     in them) smaller than k: re-identifiable
    *   min_group                   — worst-case class size
    *   min_l_diversity             — fewest distinct sensitive values
    *     in any class (1 = attribute disclosure even at k-anonymity)
    *
    * One grouped aggregation on the quasi-identifier key (map-side
    * combined; distinct-sensitive via a two-level aggregation, never
    * a collected set), then one summary reduction. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val qs = quasiCols.map(col)
    // distinct sensitive values per class WITHOUT countDistinct's
    // per-group set state: reduce to (class, sensitive) first
    val perPair = df.groupBy(qs :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__n"))
    val perClass = perPair.groupBy(qs: _*)
      .agg(sum(col("__n")).as("__rows"), count(lit(1)).as("__l"))
    perClass.agg(
      sum(col("__rows")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("__rows") < k, 1L).otherwise(0L)).as("n_groups_lt_k"),
      sum(when(col("__rows") < k, col("__rows")).otherwise(0L))
        .as("n_rows_lt_k"),
      min(col("__rows")).as("min_group"),
      min(col("__l")).as("min_l_diversity"))
  }

  /** Referential-integrity audit across a star schema: for each
    * (child —fk→ parent) relation, the orphan count (child keys with
    * no parent) and the parent-side primary-key duplication — the two
    * invariants every warehouse load must re-prove. ONE declarative
    * plan for the whole relation list (round 16): each relation's
    * child count + orphan count fuse into a single LEFT OUTER join
    * aggregate (no-match rows are the orphans, so one pass counts
    * both), the parent row/distinct-pk counts are a second one-row
    * aggregate, and all relations UNION into one job — the audit is
    * one Spark action regardless of relation count, where the
    * round-15 shape serialized 3 driver-blocking jobs per relation
    * (300 sequential jobs on a 100-relation warehouse). Small parent
    * key sets broadcast under AQE exactly as the anti join did.
    * Returns one row per relation: (relation, n_child, n_orphans,
    * orphan_ppm, n_parent, pk_dup_rows). */
  def integrityAudit(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(relations.nonEmpty, "need at least one relation")
    val perRel = relations.map { case (name, child, fk, parent, pk) =>
      val c = child.filter(col(fk).isNotNull).select(col(fk).as("__fk"))
      val pKeys = parent.select(col(pk).as("__pk"))
        .filter(col("__pk").isNotNull).distinct()
      val childAgg = c.join(pKeys, col("__fk") === col("__pk"), "left_outer")
        .agg(count(lit(1)).as("n_child"),
          coalesce(sum(when(col("__pk").isNull, 1L).otherwise(0L)), lit(0L))
            .as("n_orphans"))
      val parentAgg = parent.agg(count(lit(1)).as("n_parent"),
        (count(lit(1)) - countDistinct(col(pk))).as("pk_dup_rows"))
      childAgg.crossJoin(parentAgg)
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          when(col("n_child") === 0, 0L)
            .otherwise(expr("n_orphans * 1000000 div n_child"))
            .as("orphan_ppm"),
          col("n_parent"), col("pk_dup_rows"))
    }
    perRel.reduce(_ unionByName _).orderBy("relation")
  }

  /** k-anonymity GENERALIZATION LADDER: re-identification risk at
    * every prefix of the quasi-identifier list in ONE Expand pass
    * (ROLLUP over the cell counts — no per-level rescans): per
    * ladder level, the group count, singleton-group count (k = 1 ⇒
    * unique rows) and singleton share. Dropping columns left-to-right
    * IS the generalization: the table answers "how many columns must
    * I coarsen away before nobody is unique". All integral. Returns
    * (level, n_groups, n_singletons, singleton_ppm) where level =
    * number of quasi-identifiers retained. */
  def kAnonLadder(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val cells = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__rows"))
    // one Expand pass: each rollup output row IS one group at its
    // ladder level, carrying that group's TOTAL row count
    val rolled = cells.rollup(quasiCols.map(col): _*)
      .agg(grouping_id().cast("int").as("__gid"),
        sum(col("__rows")).as("__tot"))
    rolled
      // grand total (all columns rolled away) is not a ladder level
      .filter(col("__gid") < (1 << quasiCols.size) - 1)
      .groupBy(col("__gid"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("__tot") === 1, 1L).otherwise(0L)).as("n_singletons"))
      .select(
        // gid has one bit per rolled-up trailing column
        (lit(quasiCols.size)
          - expr("CAST(log2(__gid + 1) AS INT)")).as("level"),
        col("n_groups"), col("n_singletons"),
        expr("n_singletons * 1000000 div n_groups").as("singleton_ppm"))
      .orderBy(desc("level"))
  }

  /** Typed-field profile of a semi-structured JSON column: extract
    * one path per group and report count, null/unparsable count, and
    * exact integer min/max/sum — the schema-discovery step before
    * promoting a props blob to a real column. One narrow projection +
    * one grouped aggregation; the JSON parse stays inside codegen
    * (`get_json_object`). Returns (group, n, n_null, min_v, max_v,
    * sum_v). */
  def jsonFieldStats(df: DataFrame, groupCol: String, jsonCol: String,
                     path: String): DataFrame =
    df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("g"),
        get_json_object(col(jsonCol), path).cast("long").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(col("v")).as("sum_v"))
      .withColumnRenamed("g", groupCol)
      .orderBy(groupCol)

  /** Schema/profile drift between two snapshots of the same table
    * (yesterday's crawl vs today's): per column, row count, null rate
    * and exact distinct cardinality on each side plus the null-rate
    * delta — the "did the upstream feed silently change shape" check
    * that runs before any content-level drift test. One aggregation
    * pass per side over a bounded literal column list (the multi-agg
    * row explodes into one output row per column, the [[check]] /
    * corrPairs single-scan shape). All outputs integral. */
  def profileDrift(a: DataFrame, b: DataFrame,
                   cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    def side(df: DataFrame, tag: String) = {
      val aggs = count(lit(1)).as(s"n_$tag") +: cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_${tag}_$c"),
          countDistinct(col(c)).as(s"dist_${tag}_$c"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }
    val m = side(a, "a").crossJoin(side(b, "b"))
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col("n_a"), col("n_b"),
        expr(s"nulls_a_$c * 1000000 div n_a").as("null_ppm_a"),
        expr(s"nulls_b_$c * 1000000 div n_b").as("null_ppm_b"),
        col(s"dist_a_$c").as("distinct_a"),
        col(s"dist_b_$c").as("distinct_b"),
        (expr(s"nulls_b_$c * 1000000 div n_b")
          - expr(s"nulls_a_$c * 1000000 div n_a")).as("null_drift_ppm"))
    }
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy("column")
  }

  /** Candidate-key detection: for each proposed column set, how close
    * it comes to uniquely identifying a row — the schema-inference
    * audit run before declaring join keys or dedup identities. One
    * grouped count per set (distinct = groups, dup rows = rows beyond
    * each group's first); a set with any NULL component never
    * qualifies (SQL key semantics). Returns (column_set, n_rows,
    * n_distinct, n_dup_rows, unique_ppm, is_key). */
  def keyCandidates(df: DataFrame, sets: Seq[Seq[String]]): DataFrame = {
    require(sets.nonEmpty, "need at least one column set")
    val spark = df.sparkSession
    val n = df.count()
    val rows = sets.map { cols =>
      require(cols.nonEmpty, "empty column set")
      val nonNull = cols.map(col(_).isNotNull).reduce(_ && _)
      val grouped = df.filter(nonNull)
        .groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("c") - 1), lit(0L))).head()
      val dist = grouped.getLong(0)
      val dup = grouped.getLong(1)
      val nn = dist + dup // non-null rows under this set
      (cols.mkString(","), n, dist, n - dist,
        if (n > 0) dist * 1000000L / n else 0L, nn == n && dup == 0L)
    }
    import spark.implicits._
    rows.toDF("column_set", "n_rows", "n_distinct", "n_dup_rows",
      "unique_ppm", "is_key")
  }

  /** Missingness co-occurrence: per column pair, how often NULLs land
    * on the same rows — the signal separating "fields die together"
    * (one broken upstream join) from independent sparsity. ONE
    * aggregation pass computes all per-column and pairwise counts
    * (column list is bounded); output is all-integral. Returns
    * (col_a, col_b, n, null_a, null_b, null_both, both_ppm). */
  def nullPattern(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val spark = df.sparkSession
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = count(lit(1)).as("__n") +:
      (cols.map(c => sum(col(c).isNull.cast("long")).as(s"__null_$c")) ++
        pairs.map { case (a, b) =>
          sum((col(a).isNull && col(b).isNull).cast("long"))
            .as(s"__both_${a}_$b")
        })
    val m = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        col(s"__null_$a").as("null_a"), col(s"__null_$b").as("null_b"),
        col(s"__both_${a}_$b").as("null_both"),
        expr(s"__both_${a}_$b * 1000000 div __n").as("both_ppm"))
    }
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy("col_a", "col_b")
  }
}
