package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.hamming64

/** Near-duplicate pairs over 64-bit signatures (SimHash, pHash, any
  * locality-preserving sketch) by pigeonhole blocking: the signature is
  * split into `maxHam + 1` bit blocks, so any pair within hamming
  * distance `maxHam` differs in at most `maxHam` blocks and must agree
  * EXACTLY on at least one — candidate generation is an equi-join on
  * (block index, block value), never an all-pairs scan. Exact hamming
  * verification then filters false positives.
  *
  * Scale shape: one explode (×blocks) + one shuffle on the block key;
  * candidate volume is bounded by bucket collisions, and a hot bucket
  * (e.g. an all-zero block from short inputs) can be salted or dropped
  * like any skewed join key. Used by d4 (text simhash) and MM3 (binary
  * pHash).
  */
object HammingNearDup {

  /** @param sigs   frame with one row per item
    * @param idCol  unique numeric/string id column name
    * @param sigCol 64-bit signature column name (long)
    * @param maxHam maximum hamming distance (inclusive)
    * @return (i, j, hamming) with i < j, hamming ≤ maxHam
    */
  def pairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHam: Int): DataFrame = {
    require(maxHam >= 0 && maxHam < 64, s"maxHam must be in [0,64), got $maxHam")
    val nBlocks = maxHam + 1
    val width = (64 + nBlocks - 1) / nBlocks
    val blocks = sigs.select(col(idCol).as("id"), col(sigCol).as("sig"),
      posexplode(array((0 until nBlocks).map { b =>
        // last block may be narrower; mask with the remaining width
        val w = math.min(width, 64 - b * width)
        shiftrightunsigned(col(sigCol), b * width)
          .bitwiseAND(lit(if (w >= 64) -1L else (1L << w) - 1))
      }: _*)))
      .toDF("id", "sig", "block", "v")
    blocks.as("a").join(blocks.as("b"),
      col("a.block") === col("b.block") && col("a.v") === col("b.v") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        col("a.sig").as("sa"), col("b.sig").as("sb"))
      .withColumn("hamming", hamming64(col("sa"), col("sb")))
      .filter(col("hamming") <= maxHam)
      .select("i", "j", "hamming")
      .dropDuplicates("i", "j")
  }
}
