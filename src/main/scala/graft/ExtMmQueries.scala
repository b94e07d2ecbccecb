package graft

import graft.core.Schema
import graft.ext.{Dedup, Events, Pipeline, Quality, Similarity, TextAnalysis}
import graft.index.IndexJob
import org.apache.spark.sql.functions._
/** Multimodal family: binary-column metadata and feature extraction over the image path.
  * Oracle-checked via CORRECTNESS_r* (see SURVEY §7.5).
  */
private[graft] object ExtMmQueries {
  import ExtShared._

  val defs: Seq[QueryDef] = Seq(

    // Binary-column plumbing: payload as opaque bytes + typed metadata.
    // Image payloads decode for real via ImageIO (Multimodal.decode,
    // PNG-tested in ExtSpec); these TEXT payloads take the
    // deterministic stub path, whose fake dimensions are mirrored in
    // DuckDB so the full mapPartitions pipeline stays oracle-checked.
    QueryDef("x_mm_meta",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        spark.table("documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("content_md5"),
            (lit(1) + pmod(Dedup.portableHash(col("text")), lit(997))).as("fake_width"),
            (lit(1) + pmod(length(col("payload")).cast("long"), lit(743))).as("fake_height"))
          .orderBy("doc_id")
      },
      Some(
        s"""SELECT doc_id,
           |       octet_length(encode(text)) AS n_bytes,
           |       md5(text) AS content_md5,
           |       1 + (${duckHash("text")} % 997) AS fake_width,
           |       1 + (CAST(octet_length(encode(text)) AS BIGINT) % 743) AS fake_height
           |FROM documents ORDER BY doc_id""".stripMargin)),

    // Frame fan-out through a REAL codec (VERDICT r3 #5): each doc
    // renders as a grayscale PNG whose pixels follow a portable md5
    // formula, gets ENCODED + DECODED with ImageIO in the partition
    // iterator, and each image row ("frame") emits mean(decoded
    // pixels). PNG is lossless ⇒ the oracle computes the exact same
    // values from the pixel formula with no codec — decode defects
    // break value parity. The mean divides an exact integer sum, so
    // there is no float-order sensitivity and no rounding.
    QueryDef("x_mm_features",
      (spark, sfDir) => {
        Corpus.registerSources(spark, sfDir)
        graft.ext.Multimodal.frameFeatures(spark, spark.table("documents"),
            "doc_id", "text", w = 8, h = 4)
          .toDF()
          .orderBy("doc_id", "frame")
      },
      Some(
        s"""WITH px AS (
           |  SELECT d.doc_id, y.y, x.x,
           |         ${duckHash("d.text || '_' || CAST(y.y AS VARCHAR) || '_' || CAST(x.x AS VARCHAR)")} % 256 AS p
           |  FROM documents d, range(4) y(y), range(8) x(x)
           |)
           |SELECT doc_id, CAST(y AS INTEGER) AS frame,
           |       sum(p) / (8 * 255.0) AS feature_mean
           |FROM px GROUP BY doc_id, y
           |ORDER BY doc_id, frame""".stripMargin))
  )
}
