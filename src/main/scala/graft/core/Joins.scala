package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for hostile data shapes at scale. */
object Joins {

  /** Salted equi-join for skewed keys: the large side's key is salted with
    * a deterministic hash-derived salt in [0, salts), the small side is
    * exploded across every salt, and the join runs on (key, salt) — so one
    * hot key spreads over `salts` reducers instead of one straggler task.
    * Result is row-identical to the plain inner join (asserted in specs).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "use a plain join for salts <= 1")
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val explodedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
