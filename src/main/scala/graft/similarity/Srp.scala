package graft.similarity

import org.apache.spark.sql.{DataFrame, functions => F}
import graft.dedup.Dedup
import graft.plans.VectorExpressions.{cosineF, dotF}

/** Signed-random-projection (SRP) LSH over an embedding column — the
  * scale path for embedding-cosine near-dup, replacing the blocked
  * all-pairs join ([[Knn.embeddingNearDups]]) when no blocking column
  * bounds the pair space.
  *
  * Charikar's SRP family: bit_i = sign(v · h_i) for `nbits`
  * deterministic Gaussian hyperplanes; P(bit differs) = θ(u,v)/π. The
  * 64-bit signature then goes through the SAME banded bucketing as
  * MinHash/SimHash ([[Dedup.bandedCandidates]]), and candidates are
  * verified with the exact codegen'd cosine — precision is always 1,
  * recall is the banding curve: at cos >= 0.95 (θ ≈ 18°, p ≈ 0.10),
  * 16 bands × 4 bits give 1-(1-(1-p)^4)^16 ≈ 0.99999; at cos ~0.5 it
  * degrades (more bands is the dial). Shuffles carry (id, 8-byte band)
  * rows — the corpus vectors move only into the bounded candidate
  * verify join.
  */
object Srp {

  /** `nbits` deterministic Gaussian hyperplanes for a `dim`-vector
    * space. Seeded per bit — same (dim, nbits, seed) always yields the
    * same family, so signatures are reproducible across runs/executors
    * (the literals are baked into the plan, broadcast for free). */
  private[graft] def hyperplanes(dim: Int, nbits: Int,
                                      seed: Long): IndexedSeq[Array[Float]] =
    (0 until nbits).map { i =>
      val r = new scala.util.Random(seed * 1000003L + i)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }

  /** 64-bit SRP signature per row: bit i = (v · h_i) > 0. One codegen'd
    * projection — nbits native dot products per row, no shuffle. */
  def signatures(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 nbits: Int = 64, seed: Long = 7L): DataFrame = {
    require(nbits > 0 && nbits <= 64, s"nbits $nbits must be in 1..64")
    val planes = hyperplanes(dim, nbits, seed)
    // r15: one fused codegen'd kernel call instead of an nbits-deep
    // when(dotF(...))-bitwiseOR expression tree — identical per-plane
    // arithmetic and sign rule (SrpBitsSpec pins bit-equality), far
    // smaller generated code (the tree dominated q101's first-run
    // janino compile time).
    df.select(F.col(idCol),
      graft.plans.VectorExpressions.srpBitsF(F.col(vecCol), planes)
        .as("srp"))
  }

  /** All pairs with cosine >= threshold, found via banded SRP buckets
    * and verified exactly (output ⊆ the true pair set by construction;
    * recall per the class doc). Output: (id1, id2, sim). */
  def cosineNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, threshold: Double, nBands: Int = 16,
                     nbits: Int = 64, seed: Long = 7L,
                     bucketCap: Option[Long] = None): DataFrame = {
    val sigs = signatures(corpus, idCol, vecCol, dim, nbits, seed)
    val cands = Dedup.bandedCandidates(sigs, idCol, "srp", nBands, bucketCap)
    val a = corpus.select(F.col(idCol).as("id1"), F.col(vecCol).as("v1"))
    val b = corpus.select(F.col(idCol).as("id2"), F.col(vecCol).as("v2"))
    cands.join(a, "id1").join(b, "id2")
      .withColumn("sim",
        F.floor(cosineF(F.col("v1"), F.col("v2")) * 1e6 + 0.5) / 1e6)
      .filter(F.col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }
}
