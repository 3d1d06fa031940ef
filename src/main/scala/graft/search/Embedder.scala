package graft.search

import org.apache.spark.sql.{Dataset, SparkSession}

/** Text-embedding seam (reference V1: nomic-embed-text 768-dim via
  * ollama, generate_note_embeddings.py:13-23). The engine never
  * assumes a live model: CI and the oracle path run the deterministic
  * hash embedder; a real model client implements the same trait and
  * is initialized once per partition inside `embed`.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Deterministic feature-hashing embedder: tokens hashed into `dim`
  * buckets with a ±1 sign hash (classic hashing trick), L2-normalized.
  * Seedable, zero-dependency, and stable across runs/partitions — the
  * properties the engine's tests and oracles need. Semantically it is
  * a bag-of-words projection: cosine ≈ token overlap, which is enough
  * to exercise every downstream vector operator honestly.
  */
final case class HashEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      for (t <- toks) {
        val h = scala.util.hashing.MurmurHash3.stringHash(t, seed)
        val idx = math.floorMod(h, dim)
        val sign = if (math.floorMod(h >> 16, 2) == 0) 1.0f else -1.0f
        v(idx) += sign
      }
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}

object Embedding {

  case class EmbeddedText(id: Long, text: String, vector: Array[Float])

  /** Batched embedding via mapPartitions: one embedder handle per
    * partition (a real model loads weights/opens a session HERE, once,
    * and runs its own internal batching over the iterator).
    */
  def embed(spark: SparkSession, rows: Dataset[(Long, String)],
      embedder: Embedder): Dataset[EmbeddedText] = {
    import spark.implicits._
    rows.mapPartitions { it =>
      it.map { case (id, text) => EmbeddedText(id, text, embedder.embed(text)) }
    }
  }
}
