package graft.ops

import graft.SparkTestBase

/** IMA ADPCM (WAV format 0x11): hand-computed nibble anchors for the
  * published step/index tables, byte-layout round-trip (header
  * predictor, LOW-nibble-first packing, block boundaries with carried
  * index), and clamp behavior. */
class AdpcmSpec extends SparkTestBase {

  test("encode/decode nibble anchors (step 7, index 0)") {
    // pred=0, index=0, step=7. sample +100: |d|=100 -> b4 (100-7=93),
    // b2 (93-3=90), b1 -> nibble 7; delta = 0+7+3+1 = 11; pred 11,
    // index 0+8=8
    assert(Multimodal.imaEncodeStep(100, 0, 0) == ((7, 11, 8)))
    // sample -100: sign bit set, same magnitude path -> nibble 15
    assert(Multimodal.imaEncodeStep(-100, 0, 0) == ((15, -11, 8)))
    // zero diff: no bits, delta = 7>>3 = 0, index 0-1 clamps to 0
    assert(Multimodal.imaEncodeStep(0, 0, 0) == ((0, 0, 0)))
    // decoder side of the same nibbles
    assert(Multimodal.imaStepNibble(7, 0, 0) == ((11, 8)))
    assert(Multimodal.imaStepNibble(15, 0, 0) == ((-11, 8)))
  }

  test("clamps: predictor saturates at +-32768/32767, index at 0..88") {
    // drive the predictor to the rail: from 32767 at max step, nibble 7
    val (p, i) = Multimodal.imaStepNibble(7, 32767, 88)
    assert(p == 32767 && i == 88, s"($p,$i)")
    val (pn, _) = Multimodal.imaStepNibble(15, -32768, 88)
    assert(pn == -32768)
  }

  test("decode(synth) reproduces the encoder's predictor sequence across blocks") {
    val nBlocks = 3
    val blockAlign = 36
    val bytes = Multimodal.synthImaAdpcmWav(11L, nBlocks, blockAlign = blockAlign)
    val a = Multimodal.decodeWav(bytes).getOrElse(fail("ADPCM WAV rejected"))
    val spb = (blockAlign - 4) * 2 + 1
    assert(a.channels == 1 && a.sampleRate == 16000 && a.samples.length == nBlocks * spb)
    // independent simulation straight through the state machine
    def src(k: Int): Int = (((k * 327 + 11L) % 65536 + 65536) % 65536 - 32768).toInt
    var index = 0
    var k = 0
    val expect = Array.newBuilder[Int]
    for (_ <- 0 until nBlocks) {
      var pred = src(k)
      expect += pred
      k += 1
      for (_ <- 0 until (blockAlign - 4) * 2) {
        val (_, p2, i2) = Multimodal.imaEncodeStep(src(k), pred, index)
        pred = p2; index = i2; k += 1
        expect += pred
      }
    }
    assert(a.samples.map(_.toInt).toSeq == expect.result().toSeq)
  }

  test("decodePcm dispatches ADPCM next to the other WAV formats") {
    assert(Multimodal.decodePcm(Multimodal.synthImaAdpcmWav(5L, 1)).isDefined)
    // stereo ADPCM and wrong bit width reject
    val b = Multimodal.synthImaAdpcmWav(5L, 1)
    b(22) = 2 // channels = 2
    assert(Multimodal.decodeWav(b).isEmpty)
  }
}
