package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.tables.Tables

/**
 * Training-data pipeline operators as driver-contract queries
 * (`SparkEntry.queries` entries over the `documents`/`embeddings`
 * fixtures). Hash-checkable ops carry a DuckDB oracle; signature/hash-
 * based ops (MinHash/SimHash/LSH/xxhash fingerprints) are engine-specific
 * by construction and are declared rows-only — their semantics are pinned
 * by ScalaTest specs with planted duplicates instead.
 */
object PipelineOps {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private def embs(s: SparkSession, d: String) = Tables(s, d, "embeddings")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- deduplication -------------------------------------------------
    "d01_exact_dedup" -> { (s, d) =>
      Dedup.exact(docs(s, d), "text", "doc_id")
        .withColumnRenamed("doc_id", "id")
    },
    "d02_minhash_dedup" -> { (s, d) =>
      Dedup.minHashLSH(docs(s, d), "text", "doc_id", threshold = 0.7)
    },
    "d03_simhash_dedup" -> { (s, d) =>
      Dedup.simHash(docs(s, d), "text", "doc_id", maxHamming = 3)
    },
    "d04_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccard(docs(s, d), "text", "doc_id", threshold = 0.7)
    },
    "d05_embedding_neardup" -> { (s, d) =>
      Similarity.cosineNearDup(embs(s, d), "embedding", "vec_id",
        dim = 64, threshold = 0.97)
    },

    // --- similarity search --------------------------------------------
    "e01_cosine_topk" -> { (s, d) =>
      val corpus = embs(s, d)
      val queries = corpus.filter(col("vec_id") < 10)
      Similarity.cosineTopK(corpus, "embedding", "vec_id",
          queries, "embedding", "vec_id", k = 5)
        .withColumn("sim", col("sim").cast("decimal(10,4)"))
    },
    "e02_ivf_topk" -> { (s, d) =>
      val corpus = embs(s, d)
      val queries = corpus.filter(col("vec_id") < 10)
      val centroids = Similarity.labelCentroids(corpus, "embedding", "label")
      Similarity.ivfTopK(corpus, "embedding", "vec_id",
          queries, "embedding", "vec_id",
          centroids, "cvec", "cid", k = 5, nprobe = 2)
        .withColumn("sim", col("sim").cast("decimal(10,4)"))
    },

    // --- text analysis -------------------------------------------------
    "t01_token_counts" -> { (s, d) =>
      TextAnalysis.tokenCounts(docs(s, d), "text", "doc_id")
    },
    "t02_quality_score" -> { (s, d) =>
      TextAnalysis.qualityScore(docs(s, d), "text", "doc_id")
    },
    "t03_lang_id" -> { (s, d) =>
      TextAnalysis.langIdOf(docs(s, d), "text", "doc_id")
    },
    "t04_fingerprints" -> { (s, d) =>
      TextAnalysis.fingerprints(docs(s, d), "text", "doc_id")
        .select(col("id"), col("n_fps"),
          element_at(col("fps"), 1).as("fp_min"),
          element_at(col("fps"), -1).as("fp_max"))
    },

    // --- temporal: as-of join (no Spark built-in; composed op) ----------
    "j01_asof_join" -> { (s, d) =>
      val ev = Tables(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // dedupe right side per (user, ts) so tie-handling is deterministic
      // across engines
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("value")).as("click_value"))
      graft.ops.AsOf.join(purchases, clicks, Seq("user_id"),
          "ts", "click_ts")
        .select(col("event_id"), col("user_id"),
          // decimal-round then back to double: written DECIMAL columns
          // hash-mismatch in the driver (pandas Decimal "3.40" vs duckdb
          // float "3.4") — see Inventory's hash-parity rules
          col("value").cast("decimal(18,2)").cast("double")
            .as("purchase_value"),
          col("click_value").cast("decimal(18,2)").cast("double")
            .as("click_value"))
        .orderBy(col("event_id"))
    },

    // --- multimodal plumbing (decode stubbed; shape real) ---------------
    "m01_media_features" -> { (s, d) =>
      Multimodal.extractFeatures(s, Multimodal.mediaFromDocuments(docs(s, d)))
        .select(col("id"), col("format"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f1"),
          round(element_at(col("features"), 16).cast("double"), 4).as("f16"))
        .orderBy(col("id"))
    },
    "m02_frame_sample" -> { (s, d) =>
      Multimodal.sampleFrames(s, Multimodal.mediaFromDocuments(docs(s, d)))
        .orderBy(col("id"), col("frame_idx"))
    }
  )

  /** DuckDB-dialect oracles for the hash-checkable subset. */
  val oracle: Map[String, String] = Map(
    "j01_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS click_ts, max(value) AS click_value FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
         SELECT p.event_id, p.user_id, CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_value, CAST(CAST(c.click_value AS DECIMAL(18,2)) AS DOUBLE) AS click_value
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts
         ORDER BY p.event_id""",
    "d01_exact_dedup" ->
      """SELECT doc_id AS id, min(doc_id) OVER w AS keep_id, count(*) OVER w AS n_copies, doc_id <> min(doc_id) OVER w AS is_dup FROM documents WINDOW w AS (PARTITION BY text) ORDER BY id""",
    "t01_token_counts" ->
      """SELECT doc_id AS id, CAST(length(text) AS INTEGER) AS n_chars, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_words, CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS n_subwords FROM documents ORDER BY id""",
    "m02_frame_sample" ->
      """SELECT doc_id AS id, CAST(f.i - 1 AS INTEGER) AS frame_idx, CAST(ord(array_extract(text, (f.i - 1) * 64 + 1)) AS INTEGER) AS frame_byte FROM documents, LATERAL (SELECT unnest(generate_series(1, least(8, CAST(ceil(length(text) / 64.0) AS INTEGER)))) AS i) f ORDER BY id, frame_idx"""
  )
}
