package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** End-to-end streaming example: drive the events table through a
  * file-source streaming query (windowed stats) and the stateful
  * sessionizer, synchronously, with the memory sink.
  *
  *   sbt "runMain graft.examples.StreamingExample [sfDir]"
  */
object StreamingExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-example")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // file-source streaming read of the real events parquet; ts arrives as
    // ns-long (legacy nanos testdata) or timestamp (micros testdata) —
    // normalize to TimestampType either way
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val tsToTimestamp: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => df.withColumn("ts", col("ts").cast("timestamp"))
      }
    val events = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet") // file source wants a dir
      .parquet(sfDir)
      .transform(tsToTimestamp)

    val winQ = Streaming.windowedEventStats(events, windowDur = "6 hours", slideDur = "6 hours")
      .writeStream.outputMode("complete").format("memory").queryName("win").start()
    winQ.processAllAvailable(); winQ.stop()
    println(s"windowed stats rows: ${spark.table("win").count()}")
    spark.table("win").orderBy(desc("n_events")).show(5, truncate = false)

    val sessions = Streaming.sessionize(
      events.select($"user_id", $"event_id", $"ts", $"value").as[Streaming.SessionEvent],
      gapMs = 30 * 60000L)
    val sesQ = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    sesQ.processAllAvailable(); sesQ.stop()
    println(s"closed sessions: ${spark.table("sessions").count()}")
    spark.table("sessions").orderBy(desc("n_events")).show(5, truncate = false)
    spark.stop()
  }
}
