package graft.app

import graft.{GraftSession, ScaleSlope, StoreSlope}

/** Dev runner for the store-slope audit ([[graft.StoreSlope]]) without
  * paying a full Bench pass: builds each store modality at the bench
  * SF's archive and its sf/10 sibling's, probes the SAME sibling batch
  * against both, prints the per-modality growth table. The official
  * numbers land in `target/bench.json` (`store_slope`) every Bench run.
  */
object StoreSlopeAudit {
  def main(args: Array[String]): Unit = {
    val bigDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val smallDir = ScaleSlope.immediateSibling(bigDir)
      .map(_._2)
      .getOrElse(sys.error(s"no sf/10 sibling of $bigDir on disk"))
    val spark = GraftSession.create()
    println(f"[store-slope] archive decades: $smallDir -> $bigDir " +
      s"(batch fixed at $smallDir)")
    StoreSlope.measure(spark, smallDir, bigDir).foreach { r =>
      println(f"[store-slope] ${r.name}%-12s t_small ${r.tSmall}%6.2f s   " +
        f"t_big ${r.tBig}%6.2f s   ratio ${r.ratio}%5.2f   " +
        (if (r.warn) "WARN" else "ok"))
    }
    spark.stop()
  }
}
