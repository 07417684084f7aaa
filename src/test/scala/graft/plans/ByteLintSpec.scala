package graft.plans

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level source lint: no control byte below 0x09 (TAB) may appear
  * in any `.scala` file under `src/`.  A single raw NUL in a string
  * literal makes git/grep treat the whole file as binary — diffs stop
  * rendering and every line-based tool silently skips it.  This class
  * of defect recurred twice (MemCatalog round 13, Checks.scala round
  * 14), so like the collect/cartesian/window whitelists it is now
  * machine-checked instead of hand-fixed: write the backslash-u
  * escaped form in string literals, never the raw byte.
  */
class ByteLintSpec extends AnyFunSuite {

  test("no .scala file under src/ contains a raw byte < 0x09") {
    val root = Paths.get("src")
    val walk = Files.walk(root)
    val offenders =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .flatMap { p =>
          val bytes = Files.readAllBytes(p)
          val bad = bytes.indices.filter(i => (bytes(i) & 0xff) < 0x09)
          if (bad.isEmpty) None
          else Some(s"$p: raw byte(s) < 0x09 at offset(s) ${bad.take(5).mkString(", ")}" +
            (if (bad.size > 5) s" (+${bad.size - 5} more)" else ""))
        }
        .toList
      finally walk.close()
    assert(offenders.isEmpty,
      "raw control bytes in source (write the \\u0000 escape instead):\n  " +
        offenders.mkString("\n  "))
  }
}
