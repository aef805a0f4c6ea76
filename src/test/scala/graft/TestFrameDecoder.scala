package graft

import graft.functions.Multimodal.FrameDecoder

/** Test SPI provider (registered via META-INF/services in test resources):
  * a "codec" whose framing is four equal chunks per payload — deliberately
  * different from frameSample's `frameBytes` chunking, so a routed row is
  * distinguishable from the stand-in by frame count and sizes alone. */
class TestFrameDecoder extends FrameDecoder {
  override def formats: Set[String] = Set("video/test-quarters")
  override def frames(payload: Array[Byte], stride: Int): Iterator[(Long, Array[Byte])] = {
    val quarter = math.max(payload.length / 4, 1)
    val all = payload.grouped(quarter).take(4).toVector
    Iterator.range(0, all.size, stride).map(i => (i.toLong, all(i)))
  }
}
