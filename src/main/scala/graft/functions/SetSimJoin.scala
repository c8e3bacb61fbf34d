package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the classic
  * All-Pairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08,
  * public algorithms): find every pair with Jaccard ≥ t WITHOUT the
  * all-pairs product.
  *
  * Why it scales where q17's crossJoin baseline can't: tokens get a
  * global rarest-first total order (document frequency ascending, token
  * ascending); each record only indexes its PREFIX — the first
  * |x| − ⌈t·|x|⌉ + 1 ordered tokens. The prefix-filtering lemma
  * guarantees two records with J ≥ t share at least one prefix token
  * under the same total order, so the candidate generator is a plain
  * token equi-join over prefixes (at t=0.9 a 100-token record indexes
  * ~11 tokens, and the rarest-first order makes those the LOW-frequency
  * tokens — small join buckets by construction). A length-ratio filter
  * (t ≤ |a|/|b| ≤ 1/t, exact integer form) drops cross-size candidates
  * before verification, and exact verification runs only on surviving
  * pairs. No false negatives at any stage — output EQUALS brute force
  * (the q107 oracle re-derives it as the full quadratic join in SQL).
  *
  * The threshold is an exact rational tNum/tDen so every comparison is
  * integer arithmetic (tDen·|a∩b| ≥ tNum·|a∪b|) — no float thresholds
  * anywhere, bit-stable across engines.
  */
object SetSimJoin {

  /** Candidate (a_id, b_id) pairs — prefix-token equi-join + length
    * filter, a superset of the true result by the prefix-filtering
    * lemma. Exposed for the pruning-effectiveness spec. */
  private[graft] def candidates(docs: DataFrame, idCol: String, wordsCol: String,
                                tNum: Long, tDen: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(col(wordsCol)).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    // per-record tokens in the global (df asc, tok asc) order; prefix
    // length |x| - ceil(t|x|) + 1 via integer ceiling division
    val pre = toks.join(dfreq, "tok")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("doc_id"), size(col("st")).as("len"),
        expr(s"transform(st, x -> x.tok)").as("sw"))
      .withColumn("plen",
        col("len") - expr(s"CAST(($tNum * len + $tDen - 1) div $tDen AS INT)") + 1)
      .select(col("doc_id"), col("len"), explode(slice(col("sw"), lit(1), col("plen"))).as("tok"))
    pre.as("a").join(pre.as("b"), Seq("tok"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .where(col("a.len") * tNum <= col("b.len") * tDen &&
        col("b.len") * tNum <= col("a.len") * tDen)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** All pairs with Jaccard(words_a, words_b) ≥ tNum/tDen, exactly.
    * `wordsCol` must hold de-duplicated token arrays. Output:
    * (a_id, b_id, n_common, n_union) with a_id < b_id. */
  def jaccardSelfJoin(docs: DataFrame, idCol: String, wordsCol: String,
                      tNum: Long, tDen: Long): DataFrame = {
    val cand = candidates(docs, idCol, wordsCol, tNum, tDen)
    cand
      .join(docs.select(col(idCol).as("a_id"), col(wordsCol).as("aw")), "a_id")
      .join(docs.select(col(idCol).as("b_id"), col(wordsCol).as("bw")), "b_id")
      .withColumn("n_common", size(array_intersect(col("aw"), col("bw"))))
      .withColumn("n_union", size(col("aw")) + size(col("bw")) - col("n_common"))
      .where(col("n_common") * tDen >= col("n_union") * tNum)
      .select("a_id", "b_id", "n_common", "n_union")
  }
}
