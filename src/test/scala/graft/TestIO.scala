package graft

import org.apache.spark.sql.DataFrame

/** Shared probe/generator IO helpers (test scope). */
object TestIO {

  /** Write `df` as the single parquet FILE `dir/name` — the streaming
    * sources glob-filter on a literal file name, so multi-part
    * directory layouts are invisible to them. Compute stays parallel
    * via localCheckpoint; only the final write serializes through one
    * task. Used by StreamScaleProbe and Sf1Gen. */
  def writeSingleParquet(df: DataFrame, dir: String, name: String): Unit = {
    val spark = df.sparkSession
    val stage = s"$dir/__stage_$name"
    df.localCheckpoint().coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file in $stage"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(stage).listFiles().foreach(_.delete())
    new java.io.File(stage).delete()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
