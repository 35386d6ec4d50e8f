package graft.multimodal

/** REAL video decode for AVI containers — JDK-only, retiring the last
  * honest stub in the multimodal family (reference: the repo treats
  * media as opaque binary + typed metadata; decode itself is the part
  * that historically needed a native codec).
  *
  * What the JDK can and cannot do governs the honest boundary here:
  * there is no H.264/VP9 codec on a bare JVM, but the two classic AVI
  * payload families ARE decodable with nothing but the JDK —
  *
  *   - '##dc' MJPEG frames: each frame is a complete JPEG image
  *     (JFIF/EXIF), decoded by the SAME javax.imageio path the image
  *     modality already uses. (True broadcast MJPEG may strip the
  *     Huffman tables from each frame; such frames fail per-frame and
  *     are COUNTED, not hidden — see the f6 lane.)
  *   - '##db' raw DIB frames: uncompressed BITMAPINFOHEADER bitmaps
  *     (BI_RGB, 24/32-bit), decoded here directly — bottom-up row
  *     order, BGR byte order, 4-byte row stride — which makes the
  *     frame statistics EXACT (no lossy codec in the path), the
  *     property the specs pin bit-for-bit.
  *
  * Container parsing is a plain RIFF walk: `RIFF…AVI ` → `hdrl` LIST
  * (avih main header; one `strl` per stream with `strh`/`strf`) →
  * `movi` LIST holding the frame chunks (possibly nested inside
  * `rec ` LISTs) → optional `idx1`, which we never need (the payload
  * is already in memory; two linear scans beat trusting a possibly
  * absent or stale index). Stream N's frames are the chunks whose
  * fourcc is "NNdc"/"NNdb"; we bind to the FIRST 'vids' stream.
  *
  * Frame geometry/timing come from the container (strf biWidth/
  * biHeight, strh dwScale/dwRate — fps = rate/scale, the AVI
  * convention), and n_frames is the COUNT OF ACTUAL FRAME CHUNKS, not
  * the header's dwLength (headers lie on truncated files; data does
  * not). Feature pooling samples up to `sampleFrames` frames evenly
  * (always including first and last — the standard frame-sampling
  * shape for video embedding models) and pools per-frame channel
  * means into 8 lanes:
  *
  *   f0/f1/f2  mean R/G/B over decoded sampled frames (0..1)
  *   f3        mean |Δ mean-luma| between consecutive sampled frames
  *             (temporal activity — 0 for a static or 1-frame clip)
  *   f4/f5     mean luma of the first / last sampled frame
  *   f6        fraction of SAMPLED frames that failed to decode
  *             (codec honesty lane — a clip full of stripped-table
  *             MJPEG reports f6 = 1.0 instead of silently zeroing)
  *   f7        bias lane (1.0)
  *
  * Malformed input never throws: anything that is not a RIFF-AVI with
  * a video stream returns None (the caller's keep-and-flag
  * convention), and a chunk walk that runs off the end simply stops —
  * a truncated file yields the frames that physically exist.
  */
object AviDecoder {

  /** Container metadata + pooled feature for one AVI payload. */
  final case class Decoded(width: Int, height: Int, fps: Float,
      nFrames: Int, durationMs: Int, feature: Array[Float])

  private def u32(b: Array[Byte], off: Int): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
         (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24

  private def u16(b: Array[Byte], off: Int): Int =
    if (off < 0 || off + 2 > b.length) -1
    else (b(off) & 0xff) | (b(off + 1) & 0xff) << 8

  private def fourcc(b: Array[Byte], off: Int): String =
    if (off < 0 || off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** One video stream's header facts, gathered from hdrl. */
  private final case class VidStream(streamNo: Int, scale: Long, rate: Long,
      width: Int, height: Int, compression: Long, bitCount: Int)

  /** A frame chunk's position inside the payload. */
  private final case class FrameRef(off: Int, len: Int, uncompressed: Boolean)

  def decode(payload: Array[Byte], sampleFrames: Int = 4): Option[Decoded] = {
    if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") return None
    val end = math.min(payload.length.toLong, 8 + u32(payload, 4)).toInt

    var vid: Option[VidStream] = None
    var strlSeen = 0
    val frames = collection.mutable.ArrayBuffer.empty[FrameRef]

    // Walk one LIST body [from, to); depth-bounded — a hostile payload
    // can nest 'rec ' lists but each level strictly shrinks the range.
    def walk(from: Int, to: Int, inMovi: Boolean, depth: Int): Unit = {
      var p = from
      while (p + 8 <= to && depth < 16) {
        val fcc = fourcc(payload, p)
        val size = u32(payload, p + 4)
        // negative = truncated header; oversized = corrupt length whose
        // padded advance would overflow Int and loop — stop either way
        if (size < 0 || fcc.isEmpty || size > Int.MaxValue - p - 9) return
        val dataOff = p + 8
        val dataEnd = math.min(dataOff + size, to.toLong).toInt
        if (fcc == "LIST" && dataEnd >= dataOff + 4) {
          val listType = fourcc(payload, dataOff)
          if (listType == "hdrl" || listType == "strl" || listType == "odml")
            walk(dataOff + 4, dataEnd, inMovi = false, depth + 1)
          else if (listType == "movi" || (inMovi && listType == "rec "))
            walk(dataOff + 4, dataEnd, inMovi = true, depth + 1)
        } else if (!inMovi && fcc == "strh") {
          // stream header: bind the FIRST 'vids' stream
          val isVids = fourcc(payload, dataOff) == "vids"
          if (isVids && vid.isEmpty)
            vid = Some(VidStream(strlSeen,
              scale = u32(payload, dataOff + 20), rate = u32(payload, dataOff + 24),
              width = 0, height = 0, compression = -1, bitCount = 0))
          strlSeen += 1
        } else if (!inMovi && fcc == "strf") {
          // format chunk of the stream whose strh immediately preceded it
          vid = vid.map { v =>
            if (v.streamNo == strlSeen - 1 && v.compression == -1L)
              v.copy(width = u32(payload, dataOff + 4).toInt,
                height = math.abs(u32(payload, dataOff + 8).toInt),
                compression = u32(payload, dataOff + 16),
                bitCount = u16(payload, dataOff + 14))
            else v
          }
        } else if (inMovi && fcc.length == 4 &&
            fcc(0).isDigit && fcc(1).isDigit &&
            (fcc.endsWith("dc") || fcc.endsWith("db"))) {
          val streamNo = (fcc(0) - '0') * 10 + (fcc(1) - '0')
          if (vid.exists(_.streamNo == streamNo) && dataEnd > dataOff)
            frames += FrameRef(dataOff, dataEnd - dataOff, fcc.endsWith("db"))
        }
        p = dataOff + size.toInt + (size.toInt & 1) // chunks pad to even
      }
    }
    walk(12, end, inMovi = false, depth = 0)

    vid match {
      case Some(v) if v.rate > 0 && v.scale > 0 =>
        val n = frames.length
        val fps = (v.rate.toDouble / v.scale).toFloat
        val durationMs = math.round(n * 1000.0 * v.scale / v.rate).toInt
        Some(Decoded(v.width, v.height, fps, n, durationMs,
          poolFeature(payload, frames.toIndexedSeq, v, sampleFrames)))
      case _ => None
    }
  }

  /** Per-frame channel means: (meanR, meanG, meanB, meanLuma) in 0..1,
    * or None if the frame fails to decode. */
  private def frameStats(payload: Array[Byte], f: FrameRef,
      v: VidStream): Option[(Double, Double, Double, Double)] = {
    val raw = f.uncompressed || v.compression == 0L
    if (raw) dibStats(payload, f, v) else jpegStats(payload, f)
  }

  /** Raw DIB frame: bottom-up BGR rows, stride padded to 4 bytes.
    * Means are order-independent, so we never re-order rows. */
  private def dibStats(payload: Array[Byte], f: FrameRef,
      v: VidStream): Option[(Double, Double, Double, Double)] = {
    val bpp = v.bitCount
    if ((bpp != 24 && bpp != 32) || v.width <= 0 || v.height <= 0) return None
    val bytesPerPx = bpp / 8
    val stride = (v.width * bytesPerPx + 3) & ~3
    if (f.len < stride.toLong * v.height) return None
    var sr, sg, sb = 0.0
    var y = 0
    while (y < v.height) {
      val rowOff = f.off + y * stride
      var x = 0
      while (x < v.width) {
        val p = rowOff + x * bytesPerPx
        sb += (payload(p) & 0xff)
        sg += (payload(p + 1) & 0xff)
        sr += (payload(p + 2) & 0xff)
        x += 1
      }
      y += 1
    }
    val n = v.width.toDouble * v.height * 255.0
    val (r, g, b) = (sr / n, sg / n, sb / n)
    Some((r, g, b, 0.299 * r + 0.587 * g + 0.114 * b))
  }

  /** MJPEG frame: a complete JPEG decoded by the image modality's own
    * ImageIO path. Frames with stripped Huffman tables fail here and
    * are counted by the caller — never silently zeroed. */
  private def jpegStats(payload: Array[Byte],
      f: FrameRef): Option[(Double, Double, Double, Double)] = {
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload, f.off, f.len))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var sr, sg, sb = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h * 255.0
      val (r, g, b) = (sr / n, sg / n, sb / n)
      Some((r, g, b, 0.299 * r + 0.587 * g + 0.114 * b))
    }
  }

  /** Evenly-spaced sample indices over [0, n): first and last always
    * included (k ≥ 2), floor interpolation between — the deterministic
    * frame-sampling rule the spec pins by painting exactly the sampled
    * frames white. */
  private[multimodal] def sampleIndices(n: Int, k: Int): IndexedSeq[Int] =
    if (n <= 0 || k <= 0) IndexedSeq.empty
    else if (n <= k) 0 until n
    else if (k == 1) IndexedSeq(0)
    else (0 until k).map(i => (i.toLong * (n - 1) / (k - 1)).toInt).distinct

  private def poolFeature(payload: Array[Byte], frames: IndexedSeq[FrameRef],
      v: VidStream, sampleFrames: Int): Array[Float] = {
    val idx = sampleIndices(frames.length, sampleFrames)
    val stats = idx.map(i => frameStats(payload, frames(i), v))
    val ok = stats.flatten
    val failed = stats.length - ok.length
    if (ok.isEmpty)
      Array(0f, 0f, 0f, 0f, 0f, 0f, if (stats.nonEmpty) 1.0f else 0.0f, 1.0f)
    else {
      val n = ok.length.toDouble
      // temporal delta over consecutive DECODED sampled frames
      val deltas = ok.sliding(2).collect {
        case Seq(a, b) => math.abs(b._4 - a._4) }.toSeq
      Array(
        (ok.map(_._1).sum / n).toFloat,
        (ok.map(_._2).sum / n).toFloat,
        (ok.map(_._3).sum / n).toFloat,
        (if (deltas.nonEmpty) deltas.sum / deltas.length else 0.0).toFloat,
        ok.head._4.toFloat,
        ok.last._4.toFloat,
        (failed / stats.length.toDouble).toFloat,
        1.0f)
    }
  }
}
