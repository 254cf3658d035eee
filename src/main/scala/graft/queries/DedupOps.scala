package graft.queries

import graft.{Q, Tables}
import graft.functions.{MinHash, SimHash, TextFunctions}
import graft.ops.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`: exact (hash-groupBy), n-gram
  * Jaccard (exact near-dup), MinHash+LSH and SimHash (approximate near-dup
  * — the 100 TB scale paths whose candidate generation is an equi-join on
  * band keys, never a cross join).
  */
object DedupOps {

  /** Exact n-gram Jaccard near-dup pairs ≥ 0.8 — the edge set shared by
    * q_ngram_jaccard (pair listing) and q_dedup_clusters (grouping).
    * Shape notes live on q_ngram_jaccard below. */
  private def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
    // cache the distinct shingle set: it feeds the self-join twice plus
    // the per-doc counts — without this the explode+distinct subtree (a
    // shuffle each) runs four times
    // single-row-group test file → the shingle explode would run on one
    // core; pin a keyed repartition first (no-op at real multi-file scale)
    val sh = Tables.documents(s, d)
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
      .select(col("doc_id"), explode(TextFunctions.shingles(col("text"), 3)).as("s"))
      .distinct()
      .cache()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // pair generation per shingle GROUP, not a self-join: one shuffle on
    // the shingle key, each group emits its ordered doc pairs in place
    // (array combinatorics inside the task), then the pair counts
    // aggregate map-side. The earlier broadcast self-join shipped the
    // whole shingle set to every task per run. (Exact pairwise Jaccard
    // is inherently quadratic in hot shingles — the 100 TB path is
    // q_minhash_lsh below; this operator is the exact verifier run on
    // candidate subsets.)
    val pairs = sh.groupBy(col("s"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    val jac = col("shared").cast("double") /
      (col("n_a") + col("n_b") - col("shared"))
    pairs
      .join(broadcast(counts).withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
      .join(broadcast(counts).withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        jac.as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  /** The n-gram-Jaccard pair subquery as oracle SQL (shared CTE prefix of
    * q_ngram_jaccard and q_dedup_clusters). */
  private val ngramPairsSql =
    """sh AS (
      |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |       unnest(range(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 3),
      |d AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |      GROUP BY doc_a, doc_b)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- Exact dedup: one hash-groupBy; `keep_id` is the canonical doc.
    Q("q_dedup_exact",
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY h ORDER BY h""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("h"))
    },

    // ---- Exact n-gram Jaccard near-dup pairs. Candidate generation is a
    // shared-shingle equi-join (shuffle on shingle), not a cross join; at
    // scale the MinHash variant below caps candidate fan-out further.
    Q("q_ngram_jaccard",
      s"""WITH $ngramPairsSql
        |SELECT doc_a, doc_b, shared, da.n AS n_a, db.n AS n_b,
        |  CAST(shared AS DOUBLE) / (da.n + db.n - shared) AS jaccard
        |FROM p JOIN d da ON p.doc_a = da.doc_id JOIN d db ON p.doc_b = db.doc_id
        |WHERE CAST(shared AS DOUBLE) / (da.n + db.n - shared) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      ngramJaccardPairs(s, d).orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- Near-dup GROUPS from the pair graph: alternating large-star /
    // small-star connected components (graft.ops.ConnectedComponents), so
    // chains A≈B≈C collapse into one cluster keyed by the minimum doc_id —
    // the canonical keeper a training pipeline retains. Oracle: recursive
    // min-label propagation over the same symmetric edge set.
    Q("q_dedup_clusters",
      s"""WITH RECURSIVE $ngramPairsSql,
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM p JOIN d da ON p.doc_a = da.doc_id JOIN d db ON p.doc_b = db.doc_id
        |  WHERE CAST(shared AS DOUBLE) / (da.n + db.n - shared) >= 0.8),
        |edges AS (SELECT doc_a AS ea, doc_b AS eb FROM pairs
        |          UNION SELECT doc_b, doc_a FROM pairs),
        |walk(node, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT eb, w.label FROM walk w JOIN edges e ON e.ea = w.node),
        |lab AS (SELECT node AS doc_id, MIN(label) AS cluster FROM walk GROUP BY node)
        |SELECT l.doc_id, l.cluster, CAST(c.csize AS BIGINT) AS csize
        |FROM lab l JOIN (SELECT cluster, COUNT(*) AS csize FROM lab GROUP BY cluster) c
        |  ON l.cluster = c.cluster
        |ORDER BY l.doc_id""".stripMargin) { (s, d) =>
      val edges = ngramJaccardPairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val nodes = Tables.documents(s, d).select(col("doc_id").as("node"))
      val comp = ConnectedComponents.components(edges, nodes)
      val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
      comp.join(sizes, "component")
        .select(col("node").as("doc_id"), col("component").as("cluster"), col("csize"))
        .orderBy(col("doc_id"))
    },

    // ---- MinHash+LSH near-dup pairs (scale path; no SQL oracle — the
    // driver records a rows-only check). 32 hashes, 8 bands × 4 rows:
    // collision probability ≈ 1-(1-j⁴)⁸, steep around j≈0.6.
    Q.noOracle("q_minhash_lsh") { (s, d) =>
      val docs = Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
      val sig = MinHash.signatures(docs, "doc_id", "text").cache()
      val cands = MinHash.candidates(MinHash.bands(sig, "doc_id"), "doc_id")
      val a = sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      cands.join(a, "doc_a").join(b, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(MinHash.estimatedJaccard(col("sig_a"), col("sig_b")), 6).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- Winnowed rolling-hash fingerprints (rows-only check): char-level
    // Rabin–Karp k-grams + MOSS winnowing, so documents sharing any
    // substring of length ≥ k+w-1 share a print even when whole-document
    // hashes differ (sub-document overlap dedup). Candidates are an
    // equi-join on the 8-byte print — same scale shape as MinHash bands.
    Q.noOracle("q_winnow_dedup") { (s, d) =>
      val prints = Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
        .select(col("doc_id"),
          explode(graft.functions.Winnow.fingerprints(
            TextFunctions.normalize(col("text")))).as("fp"))
        .distinct()
        .cache()
      // Document-frequency cap (MOSS practice): a print present in many
      // documents is boilerplate and generates df² candidate pairs — THE
      // quadratic hazard of shared-key candidate joins at 100 TB. Capping
      // df bounds per-print join fan-out; true near-dup pairs still share
      // plenty of low-df prints. The overlap ratio is computed over KEPT
      // prints on both sides (dropping boilerplate from one side of the
      // fraction would deflate every ratio).
      val rare = prints.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 50).select(col("fp"))
      val kept = prints.join(rare, "fp").cache()
      val counts = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = kept.select(col("fp"), col("doc_id").as("doc_a"))
      val b = kept.select(col("fp"), col("doc_id").as("doc_b"))
      val shared = a.join(b, Seq("fp"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      shared
        .join(counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .filter(col("shared").cast("double") / col("n_a") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- SimHash near-dup pairs (rows-only check): 60-bit fingerprints,
    // Hamming-LSH banding (4×15-bit chunks), exact Hamming ≤ 6 verify.
    Q.noOracle("q_simhash") { (s, d) =>
      val docs = Tables.documents(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("doc_id"))
      val sig = SimHash.signatures(docs, "doc_id", "text")
      SimHash.nearPairs(sig, "doc_id", maxDist = 6)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // ---- Edit-distance near-dup pairs: prefix blocking (equi-join on
    // (lang, first-16-chars) — a key shuffle, never a cross join) + a
    // length-difference prefilter (|len_a−len_b| > t implies distance > t,
    // so the O(L²) DP only runs on survivors). Spark's banded
    // levenshtein(l, r, threshold) early-exits above the bound — the DP is
    // O(L·t) not O(L²). Same shape as the LSH candidates: generation is
    // linear-ish, verification exact.
    Q("q_edit_dedup",
      """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND substr(a.text, 1, 16) = substr(b.text, 1, 16)
        |  AND a.doc_id < b.doc_id
        |  AND abs(len(a.text) - len(b.text)) <= 20
        |WHERE levenshtein(a.text, b.text) <= 20
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        substring(col("text"), 1, 16).as("blk"),
        length(col("text")).as("len"), col("text"))
      val a = docs.select(col("lang"), col("blk"), col("doc_id").as("doc_a"),
        col("len").as("len_a"), col("text").as("text_a"))
      val b = docs.select(col("lang"), col("blk"), col("doc_id").as("doc_b"),
        col("len").as("len_b"), col("text").as("text_b"))
      a.join(b, Seq("lang", "blk"))
        .filter(col("doc_a") < col("doc_b") &&
          abs(col("len_a") - col("len_b")) <= 20)
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("text_a"), col("text_b"), 20).cast("long").as("dist"))
        .filter(col("dist") >= 0) // banded variant returns -1 above the bound
        .orderBy(col("doc_a"), col("doc_b"))
    }
  )
}
