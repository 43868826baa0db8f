package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering key — the data-LAYOUT operator for scan
 * locality at scale: sort-or-bucket a 100 TB table by the interleaved
 * bits of two scan dimensions and every file's (min, max) footprint
 * covers a small rectangle in BOTH dimensions, so min/max file statistics
 * (parquet row-group stats, Delta/Iceberg file skipping) prune range
 * predicates on EITHER column — a plain sort gives that for the leading
 * column only.
 *
 * The z-value is pure bit algebra over non-negative ints (caller maps
 * domains onto [0, 2^bits) first — rank, epoch-day, hash-prefix, …):
 * bit i of x lands at position 2i, bit i of y at 2i+1. Everything stays
 * inside whole-stage codegen; no UDF, no driver state.
 *
 * [[zOrderSql]] emits the SAME formula as ANSI SQL so an external engine
 * (the DuckDB oracle, a warehouse writing the layout) computes identical
 * keys — layout decisions must be reproducible outside Spark.
 */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns into
    * a single long z-value. 16 bits each (the default) covers 4G cells —
    * plenty for file-level clustering. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** The identical formula as ANSI SQL over column names `x` and `y` —
    * one source of truth for cross-engine layout computation. */
  def zOrderSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      // $x/$y parenthesized — see zOrderSqlN
      val sx = s"(((($x) >> $i) & 1) << ${2 * i})"
      val sy = s"(((($y) >> $i) & 1) << ${2 * i + 1})"
      s"$sx | $sy"
    }.mkString("(", " | ", ")")
  }

  /** N-dimensional generalization: bit i of dimension d lands at
    * position i·N + d (round-robin interleave). Total bits·N must fit a
    * long. [[zValue]] is the N=2 case with (x, y) ordering. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && bits * n <= 63, s"bits*dims must fit a signed long, got $bits*$n")
    val longs = dims.map(_.cast("long"))
    (for {
      i <- 0 until bits
      (dim, d) <- longs.zipWithIndex
    } yield shiftleft(shiftright(dim, i).bitwiseAND(lit(1L)), i * n + d))
      .reduce(_ bitwiseOR _)
  }

  /** [[zValueN]] as ANSI SQL over column expressions — the same single
    * formula both engines compute, as with [[zOrderSql]]. */
  def zOrderSqlN(dims: Seq[String], bits: Int): String = {
    val n = dims.size
    require(n >= 2, s"need at least 2 dimensions, got $n")
    require(bits >= 1 && bits * n <= 63, s"bits*dims must fit a signed long, got $bits*$n")
    (for {
      i <- 0 until bits
      (d, di) <- dims.zipWithIndex
      // $d parenthesized: a compound dimension expression ("a % 8")
      // must bind before >> on BOTH engines regardless of their
      // operator-precedence tables — this string is the one formula
      // whose bit-identity the cross-engine gate relies on
    } yield s"(((($d) >> $i) & 1) << ${i * n + di})").mkString("(", " | ", ")")
  }
}
