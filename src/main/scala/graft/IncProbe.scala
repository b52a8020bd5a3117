package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Stage-decomposition probe for the incremental near-dup path: times
  * banding / bucket gather / candidate join / verify separately at a given
  * core count. Usage: `runMain graft.IncProbe <cores> <documentsParquet>`
  * (the parquet is a Synth.materializeDocuments output — generate one with
  * ScalingBench or Synth directly).
  */
object IncProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IncProbe <cores> <documentsParquet>")
    val k = args(0).toInt
    val spark = SparkSession.builder().master(s"local[$k]")
      .config("spark.sql.shuffle.partitions", 4 * k)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(args(1)).cache()
    df.count()
    val newB = df.filter(pmod(col("doc_id"), lit(8)) === 0)
    val corp = df.filter(pmod(col("doc_id"), lit(8)) =!= 0)
    def t(name: String)(f: => Any): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"TIME k=$k $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // mirror incrementalNearDupPairsFast internals
    val numHashes = 16; val bands = 4; val r = 4; val maxBucket = 1000
    def sets(d: DataFrame, idAs: String) = d.select(
      col("doc_id").as(idAs),
      graft.expressions.ShingleHashes(col("text"), 3).as("sh"))
    def bandKeys(ws: DataFrame, idAs: String) = ws
      .select(col(idAs), graft.dedup.Dedup.minHashFromHashes(col("sh"), numHashes).as("mh"))
      .select(col(idAs), explode(array((0 until bands).map(b =>
        xxhash64(slice(col("mh"), b * r + 1, r), lit(b))): _*)).as("band_key"))
    val corpusSets = sets(corp, "id_c"); val newSets = sets(newB, "id_n")
    t("corpus_banding")(bandKeys(corpusSets, "id_c").agg(max("band_key")).collect())
    val corpusBuckets = bandKeys(corpusSets, "id_c")
      .groupBy("band_key")
      .agg(graft.expressions.CappedCollectList(col("id_c"), maxBucket + 1).as("ids"))
      .filter(size(col("ids")) <= maxBucket)
      .select(col("band_key"), explode(col("ids")).as("id_c"))
    t("corpus_gather")(corpusBuckets.agg(count(lit(1))).collect())
    val candidates = bandKeys(newSets, "id_n").join(corpusBuckets, "band_key")
      .select("id_n", "id_c").distinct()
    t("candidates")(candidates.agg(count(lit(1))).collect())
    println("N_CANDIDATES " + candidates.count())
    t("verify")(graft.dedup.Dedup.incrementalNearDupPairsFast(newB, corp,
      numHashes = 16, bands = 4, thresholdPpm = 500000L).count())
    spark.stop()
  }
}
