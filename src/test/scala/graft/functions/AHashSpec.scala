package graft.functions

import graft.SparkSpec

/** Average-hash perceptual fingerprint: hand-computed bits through the REAL
  * PNG encode→decode roundtrip, brightness invariance (and its mod-256 wrap
  * limit), and the banded near-dup recovery of injected copies.
  */
class AHashSpec extends SparkSpec {

  private def hashOf(key: Long, bright: Long): Long = {
    val session = spark
    import session.implicits._
    val df = Seq((key, key, bright)).toDF("id", "img_key", "bright")
    Multimodal.aHash64(Multimodal.encodePngBatchesKeyed(df, "img_key", "bright"))
      .select("ahash").collect()(0).getLong(0)
  }

  test("hand-computed hash for the 2x2 raster, through a real PNG roundtrip") {
    // key=1: w=2, h=2; v(x,y) = (x*31 + y*17 + 1) % 256:
    //   (0,0)=1  (1,0)=32  (0,1)=18  (1,1)=49  -> total=100, n=4
    // grid buckets: b = (y*8/2)*8 + x*8/2 -> 0, 4, 32, 36
    // bit iff v*4 > 100: 32 and 49 qualify -> bits 4 and 36
    assert(hashOf(1L, 0L) == ((1L << 4) | (1L << 36)))
  }

  test("brightness shift without wrap leaves the hash unchanged") {
    // key=1 pixels max at 49: +10 cannot wrap; all means shift equally
    assert(hashOf(1L, 10L) == hashOf(1L, 0L))
  }

  test("mm_phash_neardup at sf0.001: exact copies at dist 0, brights recovered") {
    val rows = graft.queries.Registry.queries("mm_phash_neardup")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDist = rows.map(r => r._1 -> r).toMap
    // sf0.001 has 50 docs: ids %40==20 -> {20}; %40==0 -> {0, 40}
    assert(byDist(0)._4 >= 1, "the exact copy must land at distance 0")
    val brightRecovered = rows.map(_._3).sum
    assert(brightRecovered >= 1, "brightness copies must land within <=7")
    rows.foreach { case (dist, n, _, _) =>
      assert(dist >= 0 && dist <= 7 && n > 0)
    }
  }
}
