package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ustar encoder must produce archives an INDEPENDENT tool accepts:
  * round-trip through the system `tar` binary proves the header layout,
  * octal fields, and checksums are spec-conformant, not merely
  * self-consistent with our own walker. */
class TarCodecSpec extends AnyFunSuite {
  import graft.ops.MultimodalOps

  private val entries = Seq(
    "doc_1.txt" -> "hello tar world".getBytes("UTF-8"),
    "doc_2.txt" -> ("x" * 700).getBytes("UTF-8"), // spans two 512 blocks
    "doc_3.txt" -> Array.emptyByteArray)          // zero-length member

  test("system tar lists and extracts our archives byte-identically") {
    val dir = java.nio.file.Files.createTempDirectory("tarspec")
    val tarPath = dir.resolve("a.tar")
    java.nio.file.Files.write(tarPath, MultimodalOps.tarBytes(entries))
    val list = new StringBuilder
    val p = new ProcessBuilder("tar", "-tf", tarPath.toString)
      .redirectErrorStream(true).start()
    scala.io.Source.fromInputStream(p.getInputStream).getLines()
      .foreach(l => list.append(l).append('\n'))
    assert(p.waitFor() == 0, s"system tar rejected the archive:\n$list")
    assert(list.toString.split("\n").toSeq == entries.map(_._1),
      s"member list mismatch:\n$list")
    val px = new ProcessBuilder("tar", "-xf", tarPath.toString,
      "-C", dir.toString).start()
    assert(px.waitFor() == 0, "system tar extraction failed")
    for ((name, content) <- entries) {
      val extracted = java.nio.file.Files.readAllBytes(dir.resolve(name))
      assert(java.util.Arrays.equals(extracted, content),
        s"extracted $name differs")
    }
  }

  test("our walker round-trips and rejects a corrupted checksum") {
    val bytes = MultimodalOps.tarBytes(entries)
    val back = MultimodalOps.untar(bytes)
    assert(back.map(_._1) == entries.map(_._1))
    assert(back.zip(entries).forall { case ((_, a), (_, b)) =>
      java.util.Arrays.equals(a, b) })
    val corrupted = bytes.clone()
    corrupted(124) = '7' // size field flips => checksum no longer matches
    val e = intercept[IllegalArgumentException] {
      MultimodalOps.untar(corrupted)
    }
    assert(e.getMessage.contains("checksum"))
  }
}
