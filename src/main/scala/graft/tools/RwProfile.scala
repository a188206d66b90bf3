package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Sampling, Urls, TextAnalysis => TA}
import graft.sources.Tables

/** Stage-by-stage wall profile of the td_pipeline_refinedweb composition —
  * same fixture and constants as the gated row, each stage forced through
  * localCheckpoint so the printed time is that stage's own cost.
  *
  * Usage: runMain graft.tools.RwProfile [sfDir]
  */
object RwProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[rw] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val id = col("doc_id")
    val constA = "nearly identical mirrored article body token01 " +
      "token02 token03 token04 token05 token06 token07 token08 " +
      "token09 token10 token11 token12 token13 token14 token15 " +
      "token16 token17 token18"
    val k10 = floor(id / 10).cast("long").cast("string")
    val v = pmod(id, lit(10))
    val url = when(v === 0,
        concat(lit("https://ads.tracker.net/x"), id.cast("string")))
      .when(v === 1,
        concat(lit("https://example.com/casino-free-"), id.cast("string")))
      .when(v === 2, concat(lit("https://Big.example.com/page"), k10))
      .when(v === 3,
        concat(lit("https://big.example.com:443/page"), k10, lit("/")))
      .when(v.isin(4, 5, 6),
        concat(lit("https://w"), pmod(id, lit(7)).cast("string"),
          lit(".example.org/a"), id.cast("string")))
      .otherwise(concat(lit("https://s"), id.cast("string"),
        lit(".example.net/a"), id.cast("string")))
    val txt = concat(
      when(pmod(id, lit(11)) === 3,
        lit("le la et les des le la et les des ")).otherwise(lit("")),
      when(pmod(id, lit(23)) === 7,
        lit("identical duplicate page body repeated verbatim across many crawled mirrors tonight"))
        .when(pmod(id, lit(23)) === 8, lit(constA))
        .when(pmod(id, lit(23)) === 9, lit(constA + " extratoken"))
        .otherwise(col("text")),
      when(pmod(id, lit(9)) === 4, repeat(lit(" buy now"), 40))
        .otherwise(lit("")),
      when(pmod(id, lit(17)) === 6, lit(" lorem ipsum")).otherwise(lit("")),
      when(pmod(id, lit(13)) === 11,
        lit(" shared verbatim boilerplate sentence spanning twelve whole tokens for substring dedup"))
        .otherwise(lit("")))
    val docs = Tables(spark, sfDir, "documents")
      .select(id, url.as("url"), txt.as("txt"))
      .localCheckpoint()

    timed("p_urlfilter") {
      Urls.urlFilter(docs, "url",
          blockedDomains = Seq("tracker.net"),
          scoredWords = Seq(("casino", 30), ("free", 25)), maxScore = 50)
        .write.format("noop").mode("overwrite").save()
    }
    timed("p_langid") {
      docs.select(col("doc_id"), TA.langId(col("txt")).as("pl"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("p_top2") {
      docs.select(col("doc_id"),
        (TA.topNgramFraction(col("txt"), 2) < 0.18).as("q"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("p_dup3") {
      docs.select(col("doc_id"),
        (TA.dupNgramFraction(col("txt"), 3) < 0.30).as("q"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("p_c4") {
      docs.select(col("doc_id"), TA.c4DocKeep(col("txt")).as("q"))
        .write.format("noop").mode("overwrite").save()
    }
    val enriched = timed("enrich") {
      Urls.urlFilter(docs, "url",
          blockedDomains = Seq("tracker.net"),
          scoredWords = Seq(("casino", 30), ("free", 25)), maxScore = 50)
        .withColumn("pred_lang", TA.langId(col("txt")))
        .withColumn("qual_ok",
          TA.topNgramFraction(col("txt"), 2) < 0.18 &&
            TA.dupNgramFraction(col("txt"), 3) < 0.30 &&
            TA.c4DocKeep(col("txt")))
        .localCheckpoint()
    }
    val s2 = timed("url_dedup") {
      Urls.dedupByUrl(enriched.filter(col("url_keep")), "doc_id", "url")
        .filter(col("canonical_id") === col("doc_id"))
        .localCheckpoint()
    }
    val s4 = s2.filter(col("pred_lang") === "en" && col("qual_ok"))
    val pairs = timed("near_dup") {
      Dedup.nearDupPairs(s4.select(col("doc_id"), col("txt")),
        "doc_id", "txt", threshold = 0.8, bands = 32).localCheckpoint()
    }
    val s5 = timed("drop_pairs") {
      s4.join(pairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").localCheckpoint()
    }
    val sub = timed("substr") {
      Dedup.exactSubstrDedup(s5.select(col("doc_id"), col("txt")),
          "doc_id", "txt", w = 8)
        .select(col("doc_id"), col("dup_windows"), col("removed_tokens"),
          when(col("kept_text") === "", lit(0))
            .otherwise(size(split(col("kept_text"), " ")))
            .cast("int").as("n_tokens"))
        .localCheckpoint()
    }
    val s7 = timed("cap") {
      Sampling.capPerKey(
        s5.select("doc_id", "url_host").join(sub, "doc_id"),
        "doc_id", "url_host", cap = 8).localCheckpoint()
    }
    val s8 = timed("budget") {
      Sampling.budgetSelect(s7.select(col("doc_id"), col("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 5000L).localCheckpoint()
    }
    timed("assemble") {
      def member(dfm: DataFrame, name: String) =
        dfm.select(col("doc_id")).withColumn(name, lit(true))
      enriched
        .select(col("doc_id"), col("url_keep"), col("pred_lang"),
          col("qual_ok"))
        .join(member(s2, "__canon"), Seq("doc_id"), "left")
        .join(member(s5, "__nd"), Seq("doc_id"), "left")
        .join(sub, Seq("doc_id"), "left")
        .join(member(s7, "__cap"), Seq("doc_id"), "left")
        .join(member(s8, "__bud"), Seq("doc_id"), "left")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
