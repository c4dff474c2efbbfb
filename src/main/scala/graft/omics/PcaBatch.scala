package graft.omics

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.stats.Dist

/** PCA-based batch-effect check (MethylMix
  * Download_Preprocess.R:829-848: prcomp of the sample matrix followed by
  * aov(PC1 ~ batch) — "does the first principal component separate
  * batches?").
  *
  * Spark-first: per-sample feature vectors are assembled from long form
  * (the gene panel is a bounded user-chosen list — hundreds, not the 450k
  * probe space), PCA runs on the distributed Gramian via spark.ml, and the
  * one-way ANOVA of PC1 against batch is a pair of aggregates with the
  * F-tail computed from the regularized incomplete beta.
  */
object PcaBatch {

  /** @return one row: (n_samples, n_batches, f_stat, p_value) for
    *         aov(PC1 ~ batch). */
  def pc1BatchAnova(data: DataFrame, batches: DataFrame,
                    entityCol: String = "gene", sampleCol: String = "sample",
                    valueCol: String = "value", batchCol: String = "batch"): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val d = data.select(col(entityCol).cast("string").as("gene"),
      col(sampleCol).cast("string").as("sample"),
      col(valueCol).cast("double").as("value"))
    // bounded, sorted gene panel -> stable vector layout
    val genes = d.select("gene").distinct().as[String].collect().sorted
    require(genes.length <= 10000,
      s"pc1BatchAnova: gene panel of ${genes.length} exceeds the dense-vector bound")
    val idx = genes.zipWithIndex.toMap
    val bIdx = spark.sparkContext.broadcast(idx)
    val toVec = udf((pairs: Seq[org.apache.spark.sql.Row]) => {
      val arr = new Array[Double](bIdx.value.size)
      pairs.foreach { r =>
        bIdx.value.get(r.getString(0)).foreach(i => arr(i) = r.getDouble(1))
      }
      Vectors.dense(arr)
    })
    val vecs = d.groupBy("sample")
      .agg(collect_list(struct(col("gene"), col("value"))).as("pairs"))
      .withColumn("features", toVec(col("pairs"))).drop("pairs")
    val pca = new PCA().setK(1).setInputCol("features").setOutputCol("pc")
      .fit(vecs)
    val firstEl = udf((v: org.apache.spark.ml.linalg.Vector) => v(0))
    val scored = pca.transform(vecs)
      .select(col("sample"), firstEl(col("pc")).as("pc1"))
      .join(batches.select(col(sampleCol).cast("string").as("sample"),
        col(batchCol).cast("string").as("batch")), "sample")
    // one-way ANOVA of pc1 ~ batch as two aggregates
    val byBatch = scored.groupBy("batch")
      .agg(count(lit(1)).as("nb"), avg("pc1").as("mb"),
        sum(col("pc1") * col("pc1")).as("ssb_raw"))
    val grand = scored.agg(count(lit(1)).as("n"), avg("pc1").as("gm"))
    val parts = byBatch.crossJoin(broadcast(grand))
      .agg(
        sum(col("nb") * (col("mb") - col("gm")) * (col("mb") - col("gm"))).as("ss_between"),
        sum(col("ssb_raw") - col("nb") * col("mb") * col("mb")).as("ss_within"),
        count(lit(1)).as("k"), first(col("n")).as("n"))
    val pUdf = udf((f: Double, d1: Double, d2: Double) => Dist.fTail(f, d1, d2))
    parts
      .withColumn("f_stat",
        (col("ss_between") / (col("k") - 1)) /
          when(col("n") - col("k") > 0, col("ss_within") / (col("n") - col("k"))))
      .select(col("n").as("n_samples"), col("k").as("n_batches"),
        round(col("f_stat"), 6).as("f_stat"),
        round(pUdf(col("f_stat"), (col("k") - 1).cast("double"),
          (col("n") - col("k")).cast("double")), 6).as("p_value"))
  }
}
