package graft

import graft.sources.Sinks.Manifest
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck round-trip of the generation-manifest wire format: every
  * manifest the sink can produce must survive render → parse exactly —
  * the commit protocol's read-back check compares RENDERED bytes, and the
  * GC's keep-set is built from PARSED manifests, so a render/parse
  * asymmetry would either fail every commit or orphan live directories.
  * Generated over the real domain (bucket ids 0..127, generations ≥ 1,
  * `b<k>-g<gen>` directory names, possibly-empty retired lists).
  */
object ManifestProps extends Properties("Manifest") {

  private val genGen: Gen[Long] = Gen.choose(1L, 1000000L)

  private def levelName(k: Int): Gen[String] = for {
    g <- genGen
    c <- Gen.oneOf("", "c") // compacted dirs carry the 'c' suffix
  } yield s"b$k-g$g$c"

  // one to four LEVELS per bucket (oldest → newest, distinct names —
  // a bucket never lists the same directory twice)
  private val dirEntry: Gen[(Int, Seq[String])] = for {
    k <- Gen.choose(0, 127)
    n <- Gen.choose(1, 4)
    ds <- Gen.listOfN(n, levelName(k))
  } yield k -> ds.distinct

  private val manifest: Gen[Manifest] = for {
    gen <- genGen
    buckets <- Gen.choose(1, 128)
    dirs <- Gen.mapOf(dirEntry)
    retired <- Gen.listOf(levelName(0))
  } yield Manifest(gen, buckets, dirs, retired)

  property("parse(render) == identity") = Prop.forAll(manifest) { m =>
    val back = Manifest.parse(m.render)
    // retired is order-preserving; an empty list renders as "retired="
    // and must come back Nil, not Seq("")
    back == m
  }

  // parse is line-keyed, so it must not care about line ORDER — a
  // manifest rewritten by an external tool (or concatenated debug dumps)
  // with reordered lines still resolves to the same table state. (This is
  // genuinely independent of the round-trip property: it feeds parse text
  // the sink never rendered.)
  property("parse is line-order insensitive") =
    Prop.forAll(manifest, Gen.long) { (m, seed) =>
      val lines = m.render.linesIterator.toVector
      val shuffled = new scala.util.Random(seed).shuffle(lines)
        .mkString("", "\n", "\n")
      Manifest.parse(shuffled) == m
    }
}
