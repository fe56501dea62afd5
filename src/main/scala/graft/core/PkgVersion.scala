package graft.core

/** Debian/RPM package-version ordered domain.
  *
  * Semantics: dpkg's version grammar `[epoch:]version[-revision][.elN]`
  * and comparison algorithm (deb-version(5), dpkg lib/version.c), plus
  * the two vendor quirks the reference engine documents
  * (reference: /root/reference/common/version.go:38-315):
  *   - `.el7.4 > .el7_2.2` — in non-digit runs `.` beats `_` outright.
  *   - `1.6_rc1-r0 < 1.6-r1` — an `rc<d>`/`pre<d>` tail demotes a
  *     string that would otherwise win on a symbol-vs-end comparison.
  * Sentinels `#MINV#` / `#MAXV#` sort before / after every version and
  * encode "not affected" / "affected, no fix yet".
  *
  * This is a from-scratch Scala implementation of those published
  * semantics; it is pure (no Spark imports) so it can back a UDF, a
  * Catalyst expression, and property tests alike.
  */
final case class PkgVersion(epoch: Int, version: String, revision: String, elVer: String) {
  def render: String = {
    val sb = new StringBuilder
    if (epoch != 0) { sb.append(epoch); sb.append(':') }
    sb.append(version)
    if (revision.nonEmpty) { sb.append('-'); sb.append(revision) }
    if (elVer.nonEmpty) { sb.append('.'); sb.append(elVer) }
    sb.toString
  }
  def compare(that: PkgVersion): Int = PkgVersion.compare(this, that)
}

object PkgVersion {
  val MinSentinel = "#MINV#"
  val MaxSentinel = "#MAXV#"
  val Min: PkgVersion = PkgVersion(0, MinSentinel, "", "")
  val Max: PkgVersion = PkgVersion(0, MaxSentinel, "", "")

  private val versionSymbols  = Set('.', '-', '+', '~', ':', '_')
  private val revisionSymbols = Set('.', '+', '~', '_')

  /** Parse `[epoch:]version[-revision]`, extracting a trailing `.el*`
    * segment of the revision (or of the version when no revision) into
    * `elVer`. Returns Left(reason) on malformed input. */
  def parse(raw: String): Either[String, PkgVersion] = {
    val str = raw.trim
    if (str.isEmpty) return Left("empty version string")
    if (str == MaxSentinel) return Right(Max)
    if (str == MinSentinel) return Right(Min)
    if (str == "NA" || str == "N/A") return Left("version not available")

    val colon = str.indexOf(':')
    val epoch =
      if (colon < 0) 0
      else {
        val e = str.substring(0, colon)
        try {
          val v = e.toInt
          if (v < 0) return Left("negative epoch") else v
        } catch { case _: NumberFormatException => return Left("non-numeric epoch") }
      }

    val rest = str.substring(colon + 1)
    val dash = rest.lastIndexOf('-')
    var (ver, rev) =
      if (dash >= 0) (rest.substring(0, dash), rest.substring(dash + 1))
      else (rest, "")
    var el = ""
    if (rev.nonEmpty) {
      val i = rev.lastIndexOf(".el")
      if (i >= 0) { el = rev.substring(i + 1); rev = rev.substring(0, i) }
    } else {
      val i = ver.lastIndexOf(".el")
      if (i >= 0) { el = ver.substring(i + 1); ver = ver.substring(0, i) }
    }
    if (ver.isEmpty) return Left("no version component")

    def okVersionChar(c: Char)  = c.isDigit || c.isLetter || versionSymbols(c)
    def okRevisionChar(c: Char) = c.isDigit || c.isLetter || revisionSymbols(c)
    if (!ver.forall(okVersionChar)) return Left("invalid character in version")
    if (!rev.forall(okRevisionChar)) return Left("invalid character in revision")
    if (!el.forall(okRevisionChar)) return Left("invalid character in el suffix")

    Right(PkgVersion(epoch, ver, rev, el))
  }

  def parseUnsafe(raw: String): PkgVersion =
    parse(raw).getOrElse(PkgVersion(0, "", "", ""))

  /** Total comparison. Sentinels first/last; then epoch; then the
    * dpkg digit-run/non-digit-run comparison on version, revision,
    * and el suffix in turn. */
  def compare(a: PkgVersion, b: PkgVersion): Int = {
    if (a == b) return 0
    if (a == Min || b == Max) return -1
    if (b == Min || a == Max) return 1
    if (a.epoch != b.epoch) return Integer.signum(a.epoch - b.epoch)
    val v = verrevcmp(a.version, b.version)
    if (v != 0) return Integer.signum(v)
    val r = verrevcmp(a.revision, b.revision)
    if (r != 0) return Integer.signum(r)
    Integer.signum(verrevcmp(a.elVer, b.elVer))
  }

  /** Convenience: compare two raw strings (unparseable input sorts via
    * its parsed-empty form, matching the reference's unsafe path). */
  def compareRaw(a: String, b: String): Int =
    compare(parseUnsafe(a), parseUnsafe(b))

  // dpkg char weight: digits 0; letters ASCII value; '~' below
  // everything (-1); other symbols ASCII + 256.
  private def weight(c: Char): Int =
    if (c.isDigit) 0
    else if (c.isLetter) c.toInt
    else if (c == '~') -1
    else c.toInt + 256

  private val rcTail = java.util.regex.Pattern.compile("(rc[0-9]|pre[0-9])")

  /** dpkg verrevcmp: alternate non-digit runs (char-weight compare)
    * and digit runs (numeric compare, leading zeros skipped), with the
    * two NeuVector quirks applied inside the non-digit run. */
  private def verrevcmp(s1: String, s2: String): Int = {
    var i = 0
    var j = 0
    val n1 = s1.length
    val n2 = s2.length
    while (i < n1 || j < n2) {
      var firstDiff = 0
      // non-digit run
      while ((i < n1 && !s1.charAt(i).isDigit) || (j < n2 && !s2.charAt(j).isDigit)) {
        val ac = if (i < n1) weight(s1.charAt(i)) else 0
        val bc = if (j < n2) weight(s2.charAt(j)) else 0
        // quirk: '.' (302) vs '_' (351) decides immediately, '.' wins
        if (ac == 302 && bc == 351) return 1
        if (ac == 351 && bc == 302) return -1
        if (ac != bc) {
          // quirk: rc/pre tail on the symbol side demotes it below end-of-string
          if (ac > bc && bc == 0 && i < n1 && rcTail.matcher(s1.substring(i + 1)).find()) return -1
          if (ac < bc && ac == 0 && j < n2 && rcTail.matcher(s2.substring(j + 1)).find()) return 1
          return ac - bc
        }
        i += 1; j += 1
      }
      // skip leading zeros
      while (i < n1 && s1.charAt(i) == '0') i += 1
      while (j < n2 && s2.charAt(j) == '0') j += 1
      // digit run
      while (i < n1 && s1.charAt(i).isDigit && j < n2 && s2.charAt(j).isDigit) {
        if (firstDiff == 0) firstDiff = s1.charAt(i) - s2.charAt(j)
        i += 1; j += 1
      }
      if (i < n1 && s1.charAt(i).isDigit) return 1
      if (j < n2 && s2.charAt(j).isDigit) return -1
      if (firstDiff != 0) return firstDiff
    }
    0
  }
}
