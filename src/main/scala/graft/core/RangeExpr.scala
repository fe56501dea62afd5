package graft.core

/** Version-range opcode grammar.
  *
  * The reference engine encodes affected/fixed version sets as flat
  * opcode chains (`AppModuleVersion{OpCode,Version}`): groups of AND'd
  * comparisons chained with an `or*` opcode starting each new group.
  * Grammar sources (all in /root/reference):
  *   - single-token parse: updater/updater.go:224-245
  *   - GHSA range strings `>=1.3.0 <1.3.2 || ...`: ghsa.go:203-235
  *   - OSV SEMVER/ECOSYSTEM events -> opcodes: govuln.go:226-328
  *     (expected sequences pinned by govuln_test.go:21-317)
  *   - NVD start/end intervals -> `||`-chained tokens: nvd.go:363-394
  */
final case class OpVersion(opCode: String, version: String)

/** One OSV range event (only one field populated per event). */
final case class OsvEvent(introduced: String, fixed: String)

object RangeExpr {

  /** Single token like `||>=1.2.3` -> OpVersion("orgteq", "1.2.3"). */
  def parseToken(raw: String): OpVersion = {
    var s = raw
    val sb = new StringBuilder
    if (s.contains("||")) { sb.append("or"); s = s.dropWhile(_ == '|') }
    if (s.contains("<")) { sb.append("lt"); s = s.dropWhile(_ == '<') }
    else if (s.contains(">")) { sb.append("gt"); s = s.dropWhile(_ == '>') }
    if (s.contains("=")) { sb.append("eq"); s = s.dropWhile(_ == '=') }
    OpVersion(sb.toString, s)
  }

  private val tokenRe = """([><=|\s]*)([0-9A-Za-z.\-]+)""".r

  /** GHSA-style range expression -> opcode chain.
    * `">= 9.0.0, < 9.0.44 || >= 10.0.0"` ->
    * [gteq 9.0.0, lt 9.0.44, orgteq 10.0.0]. A leading `v` on the
    * version is stripped (first occurrence only, as the reference does). */
  def parseRangeExpr(str: String): Seq[OpVersion] =
    tokenRe.findAllMatchIn(str).flatMap { m =>
      val prefix = m.group(1)
      val sb = new StringBuilder
      if (prefix.contains("||")) sb.append("or")
      if (prefix.contains("<")) sb.append("lt")
      else if (prefix.contains(">")) sb.append("gt")
      if (prefix.contains("=")) sb.append("eq")
      var vv = m.group(2)
      if (vv.startsWith("v")) vv = vv.replaceFirst("v", "")
      if (sb.nonEmpty || vv.nonEmpty) Some(OpVersion(sb.toString, vv)) else None
    }.toSeq

  /** OSV events -> (affectedVer, fixedVer) opcode chains, mirroring the
    * reference's conversion order: ECOSYSTEM custom ranges first (each
    * introduced event re-decides gteq vs orgteq), then SEMVER ranges
    * (gteq vs orgteq decided once, before the semver loop), with the
    * lone trailing `introduced "0"` closing back over the chain's first
    * version when other ranges exist. */
  def osvToRanges(customRanges: Seq[Seq[OsvEvent]], semverRanges: Seq[Seq[OsvEvent]]): (Seq[OpVersion], Seq[OpVersion]) = {
    val affected = scala.collection.mutable.ArrayBuffer.empty[OpVersion]
    val fixed = scala.collection.mutable.ArrayBuffer.empty[OpVersion]

    for (events <- customRanges; i <- events.indices) {
      val ev = events(i)
      if (ev.introduced.nonEmpty) {
        val op = if (affected.nonEmpty) "orgteq" else "gteq"
        affected += OpVersion(op, ev.introduced)
        if (i + 1 < events.length && events(i + 1).introduced.nonEmpty)
          affected += OpVersion("andlt", events(i + 1).introduced)
      }
      if (ev.fixed.nonEmpty) {
        affected += OpVersion("andlt", ev.fixed)
        fixed += OpVersion("gteq", ev.fixed)
      }
    }

    val semverIntroduceOp = if (affected.nonEmpty) "orgteq" else "gteq"
    for (events <- semverRanges; i <- events.indices) {
      val ev = events(i)
      if (ev.introduced.nonEmpty) {
        affected += OpVersion(semverIntroduceOp, ev.introduced)
        if (i + 1 < events.length) {
          if (events(i + 1).introduced.nonEmpty)
            affected += OpVersion("andlt", events(i + 1).introduced)
        } else if (ev.introduced == "0" && affected.length > 1) {
          affected += OpVersion("andlt", affected.head.version)
        }
      }
      if (ev.fixed.nonEmpty) {
        affected += OpVersion("andlt", ev.fixed)
        fixed += OpVersion("gteq", ev.fixed)
      }
    }
    (affected.toSeq, fixed.toSeq)
  }

  /** NVD vulnerable-version interval. */
  final case class NvdInterval(startIncluding: String, startExcluding: String,
                               endIncluding: String, endExcluding: String)

  /** NVD intervals -> (affected tokens, fixed tokens), `||`-chained
    * between intervals exactly as nvd.go:363-394 emits them. */
  def nvdIntervalsToTokens(intervals: Seq[NvdInterval]): (Seq[String], Seq[String]) = {
    val affects = scala.collection.mutable.ArrayBuffer.empty[String]
    val fixes = scala.collection.mutable.ArrayBuffer.empty[String]
    var opAffect = ""
    var opFix = ""
    for (v <- intervals) {
      if (v.startIncluding.nonEmpty) { affects += s"$opAffect>=${v.startIncluding}"; opAffect = "" }
      else if (v.startExcluding.nonEmpty) { affects += s"$opAffect>${v.startExcluding}"; opAffect = "" }
      if (v.endIncluding.nonEmpty) {
        affects += s"$opAffect<=${v.endIncluding}"
        fixes += s"$opFix>${v.endIncluding}"
      } else if (v.endExcluding.nonEmpty) {
        affects += s"$opAffect<${v.endExcluding}"
        fixes += s"$opFix>=${v.endExcluding}"
      }
      opAffect = "||"
      opFix = "||"
    }
    (affects.toSeq, fixes.toSeq)
  }

  /** Evaluate an opcode chain against a concrete version: OR across
    * groups (a group starts at the first token and at each `or*`
    * token), AND within a group. Empty base opcode means equality. */
  def contains(chain: Seq[OpVersion], candidate: String): Boolean = {
    if (chain.isEmpty) return false
    val v = PkgVersion.parseUnsafe(candidate)
    def test(op: String, bound: String): Boolean = {
      val c = PkgVersion.compare(v, PkgVersion.parseUnsafe(bound))
      op match {
        case "lt"   => c < 0
        case "lteq" => c <= 0
        case "gt"   => c > 0
        case "gteq" => c >= 0
        case "eq" | "" => c == 0
        case _      => false
      }
    }
    var anyGroup = false
    var groupOk = true
    var started = false
    for (t <- chain) {
      val isOr = t.opCode.startsWith("or")
      val base = if (isOr) t.opCode.substring(2)
                 else if (t.opCode.startsWith("and")) t.opCode.substring(3)
                 else t.opCode
      if (!started || isOr) {
        if (started) anyGroup ||= groupOk
        groupOk = true
        started = true
      }
      groupOk &&= test(base, t.version)
    }
    anyGroup || groupOk
  }
}
