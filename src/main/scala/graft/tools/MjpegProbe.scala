package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
object MjpegProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ids = (0L until 50L).toDF("doc_id")
    val pay = Multimodal.renderedMjpegPayloads(ids, "doc_id")
    val fh = Multimodal.videoFrameHashes(pay).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hams = fh.toSeq.map { case ((id, f), h) =>
      java.lang.Long.bitCount(h ^ Multimodal.VideoRenderSpec.expectedFrameDhash(id, f))
    }
    println(s"[probe] frames=${hams.size} maxham=${hams.max} " +
      s"dist=${hams.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)}")
    val rep = Multimodal.videoDecodeReport(
      Multimodal.renderedMjpegPayloads(ids, "doc_id", corruptMod = 9L)).collect()
    val bad = rep.filter(r => r.n_frames_decoded != (if (r.id % 9 == 3) r.n_frames_present - 1 else r.n_frames_present))
    println(s"[probe] report rows=${rep.length} codecMismatch=${rep.count(_.codec != "mjpg")} countMismatch=${bad.length} nullFp=${rep.count(_.vfp.isEmpty)}")
    val fpHams = rep.filter(_.vfp.nonEmpty).map(r =>
      java.lang.Long.bitCount(r.vfp.get ^ Multimodal.VideoRenderSpec.expectedVideoFp(r.id)))
    println(s"[probe] fp maxham=${fpHams.max}")
    spark.stop()
  }
}
