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
      val admit = (for (s <- r.tAdmitSmall; b <- r.tAdmitBig;
                        ar <- r.admitRatio) yield
        f"   admit $s%5.2f -> $b%5.2f s ratio $ar%5.2f").getOrElse("")
      val erase = (for (s <- r.tEraseSmall; b <- r.tEraseBig;
                        er <- r.eraseRatio) yield
        f"   erase $s%5.2f -> $b%5.2f s ratio $er%5.2f").getOrElse("")
      println(f"[store-slope] ${r.name}%-12s probe ${r.tSmall}%5.2f -> " +
        f"${r.tBig}%5.2f s ratio ${r.ratio}%5.2f$admit$erase   " +
        (if (r.warn || r.admitWarn || r.eraseWarn) "WARN" else "ok"))
    }
    spark.stop()
  }
}
