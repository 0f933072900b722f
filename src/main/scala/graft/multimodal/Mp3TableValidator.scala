package graft.multimodal

/** Offline validation harness for candidate MP3 big-value Huffman table
  * transcriptions — the hook that makes "the unvalidated tables ship the
  * day a validated source appears" cheap ([[Mp3Decode]] header blocker
  * note). The structural checks alone (Kraft equality, prefix-freeness)
  * can prove a transcription IS a prefix code but CANNOT distinguish the
  * ISO assignment from a permuted one: a permuted-but-valid table has the
  * same codeword lengths, so it decodes real streams with clean
  * part2_3_length bit-landings to confidently wrong PCM. The only
  * falsifier is a CONFORMANCE pair — a bitstream that actually selects
  * the table plus its known-good PCM — and this harness runs exactly that
  * experiment: splice the candidate into the decoder
  * ([[Mp3Decode.decodeWith]]), decode, compare samples.
  *
  * A candidate is accepted only when ALL of:
  *  1. it is structurally a complete prefix code over its (x, y) domain
  *     (Kraft sum exactly 1 — the same bar the shipped tables pass);
  *  2. the conformance stream demonstrably READS it (decoding with the
  *     candidate removed changes the output — side-info selection alone
  *     is not evidence, a selected table with an empty region is never
  *     read);
  *  3. the stream decodes end-to-end with the candidate spliced in; and
  *  4. the decoded PCM matches the known-good samples within `tolerance`
  *     (0 for a bit-exact reference decode; a few LSBs for PCM that went
  *     through an independent decoder's rounding).
  *
  * MP3Suite demonstrates the harness does its one hard job: on streams
  * built from the validated tables it ACCEPTS the true transcription and
  * REJECTS a same-lengths permutation of it — the exact adversary the
  * structural checks cannot see.
  */
object Mp3TableValidator {

  /** A candidate transcription: `entries` maps (x << 4 | y) -> (hlen,
    * hcod) exactly like [[Mp3Decode.bigValueTables]]; `linbits` > 0 marks
    * an ESC-family table (x/y == 15 escape reads).
    */
  final case class CandidateTable(id: Int, entries: Map[Int, (Int, Int)], linbits: Int = 0)

  final case class Report(
      tableId: Int,
      structurallyValid: Boolean,
      evidenced: Boolean, // the stream demonstrably reads the table
      decoded: Boolean,
      maxAbsDiff: Int, // -1 when not comparable (decode failed / length mismatch)
      accepted: Boolean,
      reason: String)

  /** Kraft sum == 1 + prefix-freeness + domain completeness: every (x, y)
    * in [0, xmax] × [0, ymax] must have exactly one code and no code may
    * prefix another. Identical bar to Mp3Suite's structural pins on the
    * shipped tables.
    */
  private[multimodal] def structuralCheck(c: CandidateTable): Option[String] = {
    if (c.entries.isEmpty) return Some("empty table")
    val xs = c.entries.keys.map(_ >> 4)
    val ys = c.entries.keys.map(_ & 15)
    val (xmax, ymax) = (xs.max, ys.max)
    for (x <- 0 to xmax; y <- 0 to ymax)
      if (!c.entries.contains((x << 4) | y))
        return Some(s"domain hole at ($x, $y) with xmax=$xmax ymax=$ymax")
    val codes = c.entries.values.toSeq
    for ((l, cd) <- codes) {
      if (l < 1 || l > 19) return Some(s"codeword length $l out of range")
      if (cd < 0 || cd >= (1 << l)) return Some(s"code $cd does not fit in $l bits")
    }
    // Kraft equality: sum 2^-len == 1 <=> sum 2^(maxLen-len) == 2^maxLen
    val maxLen = codes.map(_._1).max
    val kraft = codes.map { case (l, _) => 1L << (maxLen - l) }.sum
    if (kraft != (1L << maxLen)) return Some(s"Kraft sum != 1 (${kraft}/${1L << maxLen})")
    // prefix-freeness: no code equals the leading bits of a longer one
    val sorted = codes.sortBy(_._1)
    for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
      val (li, ci) = sorted(i); val (lj, cj) = sorted(j)
      if (li < lj && (cj >> (lj - li)) == ci) return Some(s"code $ci/$li prefixes $cj/$lj")
      if (li == lj && ci == cj && i != j) return Some(s"duplicate code $ci/$li")
    }
    None
  }

  /** Validate candidates against one conformance pair. `expected` is the
    * stream's known-good interleaved PCM (same sample count the in-tree
    * decoder would emit — trim reservoir warm-up identically before
    * calling if the reference includes it).
    */
  def validate(bytes: Array[Byte], expected: Array[Int],
      candidates: Seq[CandidateTable], tolerance: Int = 0): Seq[Report] = {
    val selections = Mp3Decode.tableSelections(bytes)
    def samplesOf(p: Option[Mp3Decode.Pcm]) = p.map(_.samples.toSeq)
    // candidate-independent: the shipped-decode evidence baseline runs once
    // per conformance stream, not once per candidate (lazy — skipped when
    // every candidate fails structurally or is never selected)
    lazy val plainSamples = samplesOf(Mp3Decode.decode(bytes))
    candidates.map { c =>
      val overrides = Map(c.id -> (c.entries, c.linbits))
      structuralCheck(c) match {
        case Some(err) =>
          Report(c.id, structurallyValid = false, evidenced = false,
            decoded = false, -1, accepted = false, s"structural: $err")
        case None if !selections.contains(c.id) =>
          Report(c.id, structurallyValid = true, evidenced = false,
            decoded = false, -1, accepted = false,
            "stream side info never selects this table: no evidence")
        case None =>
          val withCand = Mp3Decode.decodeWith(bytes, 1 << 24, overrides)
          // evidence: the table must demonstrably be READ. An empty
          // override makes every frame that reads it reject, so comparing
          // against (a) the shipped decode and (b) the candidate decode
          // catches both cases: overriding a shipped table (plain differs
          // from without) and adding a new id (withCand differs from
          // without). A candidate so wrong that it rejects every frame that
          // reads a NEW id is indistinguishable from the id never being
          // read — reported as the ambiguity it is, never as acceptance.
          val without = samplesOf(Mp3Decode.decodeWith(bytes, 1 << 24,
            Map(c.id -> (Map.empty[Int, (Int, Int)], 0))))
          val evidenced = plainSamples != without || samplesOf(withCand) != without
          if (!evidenced)
            Report(c.id, structurallyValid = true, evidenced = false,
              decoded = withCand.isDefined, -1, accepted = false,
              if (withCand.isEmpty)
                "no decodable frames beyond the shipped baseline: table never " +
                  "read, or the transcription breaks every frame that reads it " +
                  "— no evidence either way"
              else "selected but never read (empty regions): no evidence")
          else withCand match {
            case None =>
              // the table is load-bearing (removing it changes the shipped
              // decode) and the candidate breaks the decode outright
              Report(c.id, structurallyValid = true, evidenced = true,
                decoded = false, -1, accepted = false,
                "stream does not decode with candidate spliced in")
            case Some(pcm) =>
              if (pcm.samples.length != expected.length)
                Report(c.id, structurallyValid = true, evidenced = true,
                  decoded = true, -1, accepted = false,
                  s"sample count ${pcm.samples.length} != expected ${expected.length}")
              else {
                var worst = 0
                var i = 0
                while (i < expected.length) {
                  val d = math.abs(pcm.samples(i) - expected(i))
                  if (d > worst) worst = d
                  i += 1
                }
                val ok = worst <= tolerance
                Report(c.id, structurallyValid = true, evidenced = true,
                  decoded = true, worst, accepted = ok,
                  if (ok) "accepted: conformance PCM matches"
                  else s"PCM mismatch: max |diff| $worst > tolerance $tolerance")
              }
          }
      }
    }
  }
}
