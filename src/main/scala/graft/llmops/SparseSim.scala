package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector similarity: TF-IDF cosine over the SHINGLE inverted
  * index. The weighted sibling of [[TextOps.ngramJaccardPairs]] —
  * Jaccard treats every shared shingle equally and ignores repeats,
  * while the TF-IDF dot product weights each shared shingle by its
  * rarity AND its within-doc frequency, which is what separates
  * template pages (common-shingle overlap) from true near-dups
  * (rare-shingle overlap). Shingles, not unigrams: a natural-language
  * unigram vocabulary is dominated by corpus-wide stopwords whose idf
  * carries no signal, while the trigram space is sparse enough that
  * sharing weighted mass is evidence.
  *
  * Same 100 TB shape as the other pair joins: inverted index on the
  * shingle, document-frequency cap `maxDf` excludes corpus-hot
  * shingles (their idf is ~1 so they carry no signal AND they are the
  * quadratic blowup keys — one cap serves both goals; the oracle
  * mirrors it), self-join on shingle produces only candidate pairs
  * that share a surviving shingle.
  *
  * Weights use the q57 idf convention (tf · n_docs/df — division is
  * IEEE-exact, unlike ln whose libm implementations differ across
  * engines in the last ulp). Every double SUM (pair dot products and
  * per-doc norms) is a sequential fold in shingle-sorted order, so the
  * result is association-fixed and engine-reproducible — the
  * Retrieval.bm25TopK precedent.
  */
object SparseSim {

  /** All unordered doc pairs with shingle-TF-IDF cosine ≥ `minCos`,
    * over shingles with document frequency ≤ `maxDf`. Output:
    * (doc_a, doc_b, cos_sim), doc_a < doc_b. */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      minCos: Double = 0.3, maxDf: Int = 1000): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc"),
        explode(TextOps.shingles(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf rows are unique per (doc, term) → window count IS the
    // document frequency, no second corpus scan (q57 precedent)
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    val n = df.agg(count(lit(1)).as("n_docs"))
    // weights feed three consumers (norms + both self-join sides) in
    // ONE action — a lazy localCheckpoint cannot dedupe work within
    // the first job (measured neutral), so the plan stays pure and
    // fault-tolerant; Catalyst shares the scan via exchange reuse
    // where it can
    val w = withDf.filter(col("df") <= maxDf)
      .crossJoin(broadcast(n))
      // q57's exact weight expression (integer product → cast →
      // divide) so the two tf-idf surfaces agree bit-for-bit
      .select(col("doc"), col("term"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("w"))
    val orderedFold = (c: org.apache.spark.sql.Column) =>
      aggregate(transform(sort_array(c), x => x.getField("p")),
        lit(0.0), (acc, v) => acc + v)
    val norms = w.groupBy(col("doc"))
      .agg(sqrt(orderedFold(
        collect_list(struct(col("term"), (col("w") * col("w")).as("p")))))
        .as("nrm"))
    val a = w.select(col("doc").as("da"), col("term"), col("w").as("wa"))
    val b = w.select(col("doc").as("db"), col("term"), col("w").as("wb"))
    val num = a.join(b, Seq("term"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(orderedFold(collect_list(
        struct(col("term"), (col("wa") * col("wb")).as("p"))))
        .as("num"))
    num
      .join(norms.select(col("doc").as("da"), col("nrm").as("na")), "da")
      .join(norms.select(col("doc").as("db"), col("nrm").as("nb")), "db")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("num") / (col("na") * col("nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= minCos)
  }
}
