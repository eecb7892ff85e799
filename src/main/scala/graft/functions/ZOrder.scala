package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding for multi-dimensional storage
  * clustering — the layout trick behind Delta/Iceberg `ZORDER BY`:
  * sort (or range-partition) rows by the interleaved-bit key and
  * min/max file statistics become tight on EVERY interleaved
  * dimension at once, so a conjunctive range predicate prunes files
  * on all of them (a plain sort only prunes its leading column).
  *
  * Built purely from codegen'd bitwise builtins (the classic
  * "part1by1" magic-mask spread, Morton 1966 / the bit-twiddling
  * folklore), so it stays inside whole-stage codegen and — being
  * integer-exact — replays identically in any engine, which is what
  * lets the q42 oracle recompute it in SQL.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` into the even bit positions of a
    * 32-bit value: ...b2 b1 b0 -> ...b2 0 b1 0 b0. Input must be a
    * non-negative integral Column < 2^16.
    */
  def spread16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(16711935L))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(1431655765L))
  }

  /** 32-bit Morton code of two 16-bit cell coordinates: x in the even
    * bits, y in the odd bits. Truncating low bits of the result (z
    * div 4^k) yields the enclosing 2^k x 2^k tile — the property q42
    * aggregates on and the layout spec prunes with.
    */
  def interleave(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))
}
