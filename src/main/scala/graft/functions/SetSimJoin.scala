package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering — the classic
  * All-Pairs/PPJoin family (Bayardo et al. WWW'07, Xiao et al. WWW'08,
  * public algorithms): find every pair with Jaccard ≥ t WITHOUT the
  * all-pairs product.
  *
  * Why it scales where q17's crossJoin baseline can't: tokens get a
  * global rarest-first total order (document frequency ascending, token
  * ascending) and each record only indexes its PREFIX — the first
  * |x| − ⌈t·|x|⌉ + 1 ordered tokens. The prefix-filtering lemma
  * guarantees two records with J ≥ t share at least one prefix token
  * under the same total order, so the candidate generator is a plain
  * token equi-join over prefixes, with two exact filters on top:
  *
  *  - length-ratio: t ≤ |a|/|b| ≤ 1/t, integer form;
  *  - PPJoin positional: a shared prefix token at 1-based positions
  *    (pa, pb) bounds the achievable overlap by 1 + min(|a|−pa, |b|−pb),
  *    and J ≥ t needs overlap ≥ ⌈t(|a|+|b|)/(1+t)⌉ — on a DENSE corpus
  *    (small shared vocabulary, most pairs similar: exactly the
  *    adversarial shape of the synthetic documents table) this collapses
  *    "shares any rare token" to near the true result before any
  *    verification runs.
  *
  * Tokens are dictionary-ranked to ints once (a |vocabulary|-sized
  * window — bounded by the token dictionary like q90's |sources| window,
  * never by the corpus), so the candidate join keys on an int and the
  * exact verification intersects SORTED INT arrays carried through the
  * join — no string comparisons and no join back to the corpus on the
  * hot path. No false negatives at any stage — output EQUALS brute force
  * (the q107 oracle re-derives it as the full quadratic join in SQL).
  *
  * The threshold is an exact rational tNum/tDen so every comparison is
  * integer arithmetic (tDen·|a∩b| ≥ tNum·|a∪b|) — no float thresholds
  * anywhere, bit-stable across engines.
  */
object SetSimJoin {

  /** Deduped candidate pairs with their rank-array payloads:
    * (a_id, b_id, aw, bw, a_len, b_len).
    *
    * The candidate-dedup Exchange carries ONLY (a_id, b_id, a_len,
    * b_len) — four scalars per candidate. On a dense corpus the prefix
    * equi-join emits one candidate row per SHARED PREFIX TOKEN, so
    * letting the two rank arrays ride that Exchange costs
    * O(candidates·|tokens|) shuffle bytes; instead the arrays are
    * re-attached AFTER dedup by two equi-joins back to the corpus-sized
    * ranked frame (candidate-count rows × two ints on the probe side).
    * `ranked` is eagerly localCheckpoint'd because it feeds three
    * consumers (the prefix explode and both re-attach joins) — without
    * it AQE would re-run the dictionary window per consumer. */
  private def candAndRanked(docs: DataFrame, idCol: String, wordsCol: String,
                            tNum: Long, tDen: Long): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(col(wordsCol)).as("tok"))
    // global rarest-first dictionary: |vocab|-sized window, not corpus-sized
    val dict = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .withColumn("rank", row_number().over(Window.orderBy(col("df"), col("tok"))))
      .select("tok", "rank")
    val ranked = toks.join(dict, "tok")
      .groupBy("doc_id").agg(sort_array(collect_list(col("rank"))).as("rw"))
      .select(col("doc_id"), col("rw"), size(col("rw")).as("len"))
      .withColumn("plen",
        col("len") - expr(s"CAST(($tNum * len + $tDen - 1) div $tDen AS INT)") + 1)
      .localCheckpoint(true)
    val pre = ranked.select(col("doc_id"), col("len"),
      posexplode(slice(col("rw"), lit(1), col("plen"))).as(Seq("pos0", "rtok")))
    // required overlap alpha = ceil(tNum*(la+lb) / (tNum+tDen))
    val alpha = expr(
      s"CAST(($tNum * (a.len + b.len) + ${tNum + tDen} - 1) div ${tNum + tDen} AS INT)")
    val cand = pre.as("a").join(pre.as("b"), col("a.rtok") === col("b.rtok"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .where(col("a.len") * tNum <= col("b.len") * tDen &&
        col("b.len") * tNum <= col("a.len") * tDen)
      .where(lit(1) + least(col("a.len") - (col("a.pos0") + 1),
        col("b.len") - (col("b.pos0") + 1)) >= alpha)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.len").as("a_len"), col("b.len").as("b_len"))
      .dropDuplicates("a_id", "b_id")
    (cand, ranked)
  }

  private def prefixCandidates(docs: DataFrame, idCol: String, wordsCol: String,
                               tNum: Long, tDen: Long): DataFrame = {
    val (cand, ranked) = candAndRanked(docs, idCol, wordsCol, tNum, tDen)
    cand
      .join(ranked.select(col("doc_id").as("a_id"), col("rw").as("aw")), "a_id")
      .join(ranked.select(col("doc_id").as("b_id"), col("rw").as("bw")), "b_id")
      .select("a_id", "b_id", "aw", "bw", "a_len", "b_len")
  }

  /** Candidate (a_id, b_id) pairs — a superset of the true result by the
    * prefix-filtering lemma. Exposed for the pruning-effectiveness
    * spec. */
  private[graft] def candidates(docs: DataFrame, idCol: String, wordsCol: String,
                                tNum: Long, tDen: Long): DataFrame =
    candAndRanked(docs, idCol, wordsCol, tNum, tDen)._1.select("a_id", "b_id")

  /** All pairs with Jaccard(words_a, words_b) ≥ tNum/tDen, exactly.
    * `wordsCol` must hold de-duplicated token arrays. Output:
    * (a_id, b_id, n_common, n_union) with a_id < b_id. */
  def jaccardSelfJoin(docs: DataFrame, idCol: String, wordsCol: String,
                      tNum: Long, tDen: Long): DataFrame =
    prefixCandidates(docs, idCol, wordsCol, tNum, tDen)
      .withColumn("n_common", size(array_intersect(col("aw"), col("bw"))))
      .withColumn("n_union", col("a_len") + col("b_len") - col("n_common"))
      .where(col("n_common") * tDen >= col("n_union") * tNum)
      .select("a_id", "b_id", "n_common", "n_union")

  /** Exact CONTAINMENT self-join: every DIRECTED pair with
    * |A∩B| / |A| ≥ tNum/tDen, A ≠ B — the asymmetric cousin of Jaccard
    * that catches a document CONTAINED in another (quoted articles,
    * boilerplate-wrapped mirrors) which symmetric similarity misses
    * whenever the container is much longer (J ≈ |A|/|B| → 0 while
    * containment = 1).
    *
    * Prefix filtering is one-sided here (the overlap-join shape of
    * JOSIE/ssjoin): only the CONTAINED side can be pruned — it needs
    * overlap α = ⌈t·|A|⌉, so by the prefix lemma one of A's first
    * |A| − α + 1 rarest-first tokens must appear in B — while the
    * container side has no length upper bound and must index ALL its
    * tokens. The equi-join key distribution still concentrates on RARE
    * tokens (prefixes are rarest-first, so a hot stopword enters a
    * prefix only for docs made almost entirely of hot tokens), which is
    * what keeps the candidate count near df(rare)² instead of corpus².
    * Length (|B| ≥ α) and PPJoin positional filters apply unchanged;
    * verification intersects the same sorted rank arrays, and the
    * threshold stays an exact rational. Output equals brute force. */
  def containmentSelfJoin(docs: DataFrame, idCol: String, wordsCol: String,
                          tNum: Long, tDen: Long): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), explode(col(wordsCol)).as("tok"))
    val dict = toks.groupBy("tok").agg(count(lit(1)).as("df"))
      .withColumn("rank", row_number().over(Window.orderBy(col("df"), col("tok"))))
      .select("tok", "rank")
    val ranked = toks.join(dict, "tok")
      .groupBy("doc_id").agg(sort_array(collect_list(col("rank"))).as("rw"))
      .select(col("doc_id"), col("rw"), size(col("rw")).as("len"))
      .withColumn("alpha", expr(s"CAST(($tNum * len + $tDen - 1) div $tDen AS INT)"))
      .withColumn("plen", col("len") - col("alpha") + 1)
      .localCheckpoint(true)
    val pre = ranked.select(col("doc_id"), col("len"), col("alpha"),
      posexplode(slice(col("rw"), lit(1), col("plen"))).as(Seq("pos0", "rtok")))
    val full = ranked.select(col("doc_id"), col("len"),
      posexplode(col("rw")).as(Seq("pos0", "rtok")))
    val cand = pre.as("a").join(full.as("b"), col("a.rtok") === col("b.rtok"))
      .where(col("a.doc_id") =!= col("b.doc_id"))
      .where(col("b.len") >= col("a.alpha"))
      .where(lit(1) + least(col("a.len") - (col("a.pos0") + 1),
        col("b.len") - (col("b.pos0") + 1)) >= col("a.alpha"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.len").as("a_len"))
      .dropDuplicates("a_id", "b_id")
    cand
      .join(ranked.select(col("doc_id").as("a_id"), col("rw").as("aw")), "a_id")
      .join(ranked.select(col("doc_id").as("b_id"), col("rw").as("bw")), "b_id")
      .withColumn("n_common", size(array_intersect(col("aw"), col("bw"))))
      .where(col("n_common") * tDen >= col("a_len") * tNum)
      .select(col("a_id").as("contained_id"), col("b_id").as("container_id"),
        col("n_common"), col("a_len"))
  }
}
