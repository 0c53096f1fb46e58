package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning.
  *
  * The 100 TB join lever the reference's row-at-a-time ETL has no
  * analog for: build a bloom filter over the small/filtered side's join
  * keys (distributed aggregate via the public
  * `DataFrameStatFunctions.bloomFilter`), then drop non-matching fact
  * rows AT THE SCAN, before they are shuffled. With a selective dim
  * predicate this cuts shuffle volume by orders of magnitude; false
  * positives only cost a little extra shuffle — the join that follows
  * keeps the result exact (which is what makes the operator
  * oracle-checkable bit-for-bit).
  *
  * The probe reuses Spark's own `BloomFilterMightContain` expression
  * (the one its runtime row-level filtering injects), so the test is
  * codegen'd and the serialized filter rides the plan as a literal the
  * same way a broadcast hash table would — no UDF, no driver loop.
  */
object BloomFunctions {

  /** Serialize a sketch for embedding as a plan literal. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Distributed build over `keys`'s `keyCol` (integral type). */
  def buildBytes(keys: DataFrame, keyCol: String,
      expectedItems: Long = 100000L, fpp: Double = 0.01): Array[Byte] =
    serialize(keys.stat.bloomFilter(keyCol, expectedItems, fpp))

  /** Codegen'd membership probe: `might_contain(bloom, value)`. The
    * sketch hashes longs, so `value` is cast to long — pair the build
    * and the probe on the SAME integral key column.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnBridge.expression(value.cast("long"))))
}
