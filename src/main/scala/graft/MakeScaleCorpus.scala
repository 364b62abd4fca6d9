package graft

import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Build an sf1-equivalent documents corpus from the driver's sf0.1
  * table for the pair-family scaling curve (SCALE.md): 10 replicas,
  * doc_ids offset per replica, and — for replicas 1..9 — a replica
  * tag token spliced in every 4th word.
  *
  * Why the tag: a verbatim 10x copy would give every doc 10 exact
  * twins, so pair-join outputs would grow ~100x per bucket and the
  * "measurement" would time an artifact no real 10x corpus has (dup
  * CLUSTERS scale with corpus size; cluster SIZE does not). The tag
  * keeps intra-replica duplicate structure byte-identical while
  * guaranteeing zero cross-replica shingle overlap (every 3..5-gram
  * spans a tag), and it keeps the base VOCABULARY shared — so hot
  * terms' document frequency really grows 10x, stressing the df-cap
  * and skew paths exactly as a real 10x corpus would.
  *
  * Usage: runMain graft.MakeScaleCorpus <outDir>
  */
object MakeScaleCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val reps = spark.range(10).select(col("id").cast("int").as("rep"))
    val scaled = docs
      .crossJoin(reps)
      .select(
        (col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          array_join(
            flatten(transform(
              // group words in 4s, append the replica tag after each group
              filter(
                transform(split(col("text"), " "),
                  (w, i) => when(i % 4 === 0,
                    slice(split(col("text"), " "), i + 1, lit(4)))),
                g => g.isNotNull),
              g => concat(g, array(concat(lit("rep"), col("rep")))))),
            " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    scaled
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val n = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"[make-scale-corpus] wrote $n docs to $out")
    // embeddings: same 10-replica scheme; each replica's vectors are
    // cyclically rotated by its replica index — norms (and so every
    // cosine within a replica) are preserved exactly, while replicas
    // spread across embedding space instead of stacking 10 exact
    // twins on every point (which would give q45's top-k degenerate
    // zero-distance neighbors no real 10x corpus has). IVF/LSH cell
    // populations then grow ~10x in count, not 10x in density.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val scaledEmb = emb
      .crossJoin(reps)
      .select(
        (col("vec_id") + col("rep").cast("long") * 10000000L).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("rep") + 1,
              size(col("embedding")) - col("rep")),
            slice(col("embedding"), lit(1), col("rep"))))
          .as("embedding"),
        col("label"))
    scaledEmb
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"[make-scale-corpus] wrote $ne embeddings to $out")
    // lineitem: 10 replicas for the co-purchase graph decade
    // (q202/q208/q211/q227). Order keys offset per replica — the
    // order population grows 10x, as a real 10x sales dataset's
    // would. Part keys are PERMUTED per replica by a catalog-coprime
    // multiplier — p*m mod P over the 0-based catalog [0, P), a
    // bijection because gcd(m, P) = 1 — new baskets over the SAME
    // catalog, so the DISTINCT co-purchase edge set and per-part
    // degrees genuinely grow (the superlinear-edge stress the degree
    // cap exists for). A verbatim copy would leave the distinct edge
    // set unchanged and the graph family would time a no-op decade;
    // offsetting partkeys too would make 10 disjoint graph copies,
    // which never densifies any neighborhood. rep 0 is multiplier 1 =
    // the base data, untouched.
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val maxOk = li.agg(max(col("l_orderkey"))).head.getLong(0)
    // keys are 0-based in the driver corpus: catalog = [0, nParts)
    val nParts = li.agg(max(col("l_partkey"))).head.getLong(0) + 1L
    val mults = Iterator.from(1, 2).map(_.toLong)
      .filter(m => BigInt(m).gcd(BigInt(nParts)) == 1)
      .take(10).toSeq
    val multCol = element_at(array(mults.map(lit): _*), col("rep") + 1)
    val rest = li.columns.toSeq
      .filterNot(c => c == "l_orderkey" || c == "l_partkey")
    val liScaled = li.crossJoin(reps).select(
      (col("l_orderkey") + col("rep").cast("long") * (maxOk + 1L))
        .as("l_orderkey") +:
        pmod(col("l_partkey") * multCol, lit(nParts)).as("l_partkey") +:
        rest.map(col): _*)
    liScaled
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val nl = spark.read.parquet(s"$out/lineitem.parquet").count()
    println(s"[make-scale-corpus] wrote $nl lineitem rows to $out " +
      s"(part multipliers ${mults.mkString(",")})")
    spark.stop()
  }
}
