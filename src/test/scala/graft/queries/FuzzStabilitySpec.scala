package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The fuzz battery's generated SQL is part of the oracle contract:
  * the driver compares each entry against DuckDB running the SAME
  * text, and seeds were frozen only after confirming every query is
  * non-empty at the gate SF.  A generator refactor that silently
  * changes the emitted SQL would invalidate both guarantees — so the
  * emitted text is pinned by checksum here.
  */
class FuzzStabilitySpec extends AnyFunSuite {

  private def crc(s: String): Long = {
    val c = new java.util.zip.CRC32
    c.update(s.getBytes("UTF-8"))
    c.getValue
  }

  test("generated battery is exactly the frozen 89 queries") {
    assert(FuzzQueries.queries.size == 89)
    assert(FuzzQueries.oracle.keySet == FuzzQueries.queries.keySet)
  }

  test("generated SQL text is stable (checksum pinned)") {
    val combined = FuzzQueries.oracle.toSeq.sortBy(_._1)
      .map { case (n, t) => s"$n\n$t" }.mkString("\n---\n")
    val actual = crc(combined)
    // if this fails you changed the generator or a seed: re-verify every
    // entry against DuckDB (non-empty + hash match) and re-pin
    assert(actual == FuzzStabilitySpec.PinnedCrc,
      s"fuzz SQL drifted: crc=$actual — re-verify entries, then update the pin")
  }
}

object FuzzStabilitySpec {
  val PinnedCrc = 1196554203L // round 16: +map-HOF family q_fuzzhm_01..05 (seeds 242/247/250/255/266, probed 241-270 at sf0.001 — the constraining rung — and spot-checked sf0.01/sf0.1; LAST_WIN dup-key dedup + NULL map values + map_filter→transform_values composition + map_zip_with over partially-overlapping key domains, DuckDB twin replays last-win via surviving-position lists). Prior pin 500819762 (r15: q_fuzzho family + q_fuzzj_02 re-seed 32->37). Battery verified non-empty + hash-green at sf0.001, sf0.01, sf0.1 and the drill corpora.
}
