package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key equi-joins.
  *
  * AQE's skew-join split handles most cases at runtime; this is the explicit
  * form for when a key is SO hot that even a split partition overwhelms one
  * task (the classic null-key / mega-customer / empty-document problem at
  * 100 TB): spread each fact row across `salts` sub-keys and replicate the
  * dimension once per sub-key. Shuffle volume for the dim side grows ×salts
  * (it's the small side — that's the trade), and the hot key's fact rows
  * land on `salts` tasks instead of one.
  *
  * The salt must be deterministic per fact ROW (not per key, which would
  * move the whole hot key together): callers pass the row-identity column.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways by `factRowId`.
    * Result equals `fact.join(dim, key)` exactly (SkewSpec proves it). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factRowId: Column,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(hash(factRowId), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
