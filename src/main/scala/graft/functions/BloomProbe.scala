package graft.functions

/** JVM helper behind [[graft.expr.BloomBytesMightContain]]'s codegen:
  * deserialize a [[org.apache.spark.util.sketch.BloomFilter]] from its
  * column bytes and probe one 64-bit hash. Called once per index row
  * per lookup (index relations are one-row-per-file metadata). */
object BloomProbe {
  def mightContain(bytes: Array[Byte], hash: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter.readFrom(bytes).mightContainLong(hash)
}
