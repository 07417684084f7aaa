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

  test("generated battery is exactly the frozen 79 queries") {
    assert(FuzzQueries.queries.size == 79)
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
  val PinnedCrc = 3014357675L // battery verified non-empty + hash-green at sf0.01 AND sf0.1 + alt-seed drills at both seeds + the sf0.1-derived alt corpus (round 14: +recursive-CTE/window-frame/pipe-syntax/generator/JSON-path families, composition rmax coalesce, mutation gates read every snapshot via VERSION AS OF; q_fuzz_10 re-seeded 10->16 after going empty on the seed-4242 alt corpus)
}
