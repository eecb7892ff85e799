package graft.functions

/** The engine's portable integer hash family:
  * h_i(x) = ((2i+1)*x + i*i + 7) mod m.
  * Shared by the MinHash signature ([[MinHashAgg]]), the Bloom sketch
  * ([[BloomAgg]]), and spelled out identically in the DuckDB oracle SQL
  * — one definition so the engines can never drift.
  */
object PortableHash {
  def family(i: Int, x: Long, mod: Long): Long =
    ((2L * i + 1) * x + i.toLong * i + 7) % mod
}
