package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINER over a document corpus — the
  * bounded-merge loop q84 computes only the first step of (Sennrich et
  * al. 2016, "Neural machine translation of rare words with subword
  * units"). Mirrors the KMeans trainer pattern: the corpus is touched
  * by exactly ONE word-count aggregation; every merge iteration after
  * that runs over the VOCABULARY (Zipf-bounded, ≪ corpus — pair counts
  * are weighted by the word count `c`, never re-derived from raw
  * text), with `localCheckpoint` per merge cutting the O(merges)
  * lineage exactly as the Lloyd loop does.
  *
  * Determinism contract: the best pair per round is the (weight DESC,
  * left ASC, right ASC) minimum — a total order, so the merge list is
  * identical at any partition count and across reruns; merges apply
  * greedily LEFT-TO-RIGHT non-overlapping within each word (the
  * reference BPE semantics: "aaa" + merge (a,a) → [aa, a]), via a pure
  * array fold both engines replay ([[mergeFold]] ↔ the q131 DuckDB
  * `list_reduce` twin).
  *
  * 100 TB shape: one corpus exchange (word count, map-side combined);
  * per merge, one vocab-sized pair-count exchange and a global top-1
  * (TakeOrderedAndProject — no full sort), with the winning pair
  * broadcast back onto the vocab. Nothing corpus-sized survives the
  * first aggregation; no `.collect()` anywhere.
  */
object BPE {

  /** Initial symbol sequence of a word: its characters.
    * Callers must pre-filter `char_length >= 2` (shorter words can
    * never participate in any pair; Spark's `sequence(1, 0)` would
    * run DESCENDING on the empty word).
    */
  private[graft] def charSyms(tok: Column): Column =
    transform(sequence(lit(1), length(tok)), i => substring(tok, i, lit(1)))

  /** Greedy left-to-right non-overlapping merge of adjacent (l, r)
    * symbol pairs into l||r, as a SQL fold over `symsCol`. After a
    * merge the accumulator's last element becomes l||r ≠ l (r is
    * never empty), so overlapping re-merges are impossible by
    * construction. DuckDB twin: `list_reduce` in the q131 oracle.
    */
  private[graft] def mergeFoldSql(symsCol: String, lCol: String,
      rCol: String): String =
    s"aggregate($symsCol, CAST(array() AS ARRAY<STRING>), (acc, x) -> " +
      s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = $lCol " +
      s"AND x = $rCol " +
      s"THEN concat(slice(acc, 1, size(acc) - 1), array(concat($lCol, $rCol))) " +
      s"ELSE concat(acc, array(x)) END)"

  /** Adjacent symbol pairs of a word as (l, r) structs, weighted
    * downstream by the word count.
    */
  private[graft] def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Train `merges` BPE merge rules over `docs(textCol)` (plain-split
    * tokenization — the repo-wide `split(text, ' ')` convention).
    * Returns (rank, left, right, merged, w): the merge list in
    * training order with each rule's winning pair weight. Stops early
    * (fewer rows) if the vocabulary runs out of adjacent pairs.
    */
  def fit(docs: DataFrame, merges: Int, textCol: String = "text"): DataFrame = {
    require(merges >= 1, s"need merges >= 1, got $merges")
    val spark = docs.sparkSession
    val wc = docs
      .select(split(col(textCol), " ").as("t"))
      .select(explode(col("t")).as("tok"))
      .filter(char_length(col("tok")) >= 2)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    var words = wc
      .select(col("c"), charSyms(col("tok")).as("syms"))
      .localCheckpoint() // vocab-sized; cuts the corpus lineage
    var rules = Seq.empty[DataFrame]
    var exhausted = false
    for (rank <- 1 to merges if !exhausted) {
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("c"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("w"))
        .orderBy(col("w").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint() // 1 row; evaluated once, reused twice below
      if (best.isEmpty) exhausted = true
      else {
        rules :+= best.select(lit(rank).as("rank"), col("l").as("left"),
          col("r").as("right"),
          concat(col("l"), col("r")).as("merged"), col("w"))
        words = words.crossJoin(broadcast(best))
          .select(col("c"),
            expr(mergeFoldSql("syms", "l", "r")).as("syms"))
          .localCheckpoint()
      }
    }
    if (rules.isEmpty) {
      import spark.implicits._
      Seq.empty[(Int, String, String, String, Long)]
        .toDF("rank", "left", "right", "merged", "w")
    } else rules.reduce(_ unionByName _)
  }

  /** Encode every word of `docs(textCol)` with a trained merge list
    * (the `fit` output), returning (tok, c, syms): each distinct word,
    * its corpus count, and its subword segmentation after applying all
    * rules in rank order. The rule list folds to one array row and
    * broadcasts; application is a per-word double fold (rules outer,
    * symbols inner) — one vocab-sized stage, no joins per rule.
    */
  def encode(docs: DataFrame, rules: DataFrame,
      textCol: String = "text"): DataFrame = {
    val folded = rules
      .select(struct(col("rank"), col("left"), col("right")).as("m"))
      .agg(array_sort(collect_list(col("m"))).as("ms"))
    docs
      .select(split(col(textCol), " ").as("t"))
      .select(explode(col("t")).as("tok"))
      .filter(char_length(col("tok")) >= 1)
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(folded))
      .select(col("tok"), col("c"), expr(
        // outer fold over rules in rank order, inner merge fold —
        // same kernel as training so encode can never drift from fit
        "aggregate(ms, transform(sequence(1, char_length(tok)), " +
          "i -> substring(tok, i, 1)), (syms, m) -> " +
          mergeFoldSql("syms", "m.left", "m.right") + ")").as("syms"))
  }
}
