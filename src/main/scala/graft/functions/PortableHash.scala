package graft.functions

/** The engine's portable integer hash family:
  * h_i(x) = ((2i+1)*x + i*i + 7) mod m.
  * Shared by the MinHash signature ([[MinHashAgg]]), the Bloom sketch
  * ([[BloomAgg]]), and spelled out identically in the DuckDB oracle SQL
  * — one definition so the engines can never drift.
  */
object PortableHash {
  /** x is reduced mod `mod` BEFORE the multiply — congruent to the
    * direct formula for every x, and keeps (2i+1)*(x mod m) well inside
    * Long for any key (the direct product overflows for keys near
    * Long.MaxValue, flipping the % sign).
    */
  def family(i: Int, x: Long, mod: Long): Long =
    ((2L * i + 1) * (x % mod) + i.toLong * i + 7) % mod
}
