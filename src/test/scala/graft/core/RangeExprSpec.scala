package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Pins the opcode-chain grammar to the reference's documented
  * expectations (govuln_test.go:21-317 sequences, ghsa.go:203-235
  * grammar, nvd.go:363-394 interval emission). */
class RangeExprSpec extends AnyFunSuite {

  test("single-token parse") {
    assert(RangeExpr.parseToken(">=1.2.3") == OpVersion("gteq", "1.2.3"))
    assert(RangeExpr.parseToken("||<2.0") == OpVersion("orlt", "2.0"))
    assert(RangeExpr.parseToken("<=9") == OpVersion("lteq", "9"))
    assert(RangeExpr.parseToken("1.0") == OpVersion("", "1.0"))
  }

  test("GHSA range expression") {
    assert(RangeExpr.parseRangeExpr(">= 9.0.0, < 9.0.44") ==
      Seq(OpVersion("gteq", "9.0.0"), OpVersion("lt", "9.0.44")))
    assert(RangeExpr.parseRangeExpr(">=1.3.0 <1.3.2 || >=1.4.0 <1.4.11") ==
      Seq(OpVersion("gteq", "1.3.0"), OpVersion("lt", "1.3.2"),
        OpVersion("orgteq", "1.4.0"), OpVersion("lt", "1.4.11")))
    // leading v stripped once
    assert(RangeExpr.parseRangeExpr(">=v1.0") == Seq(OpVersion("gteq", "1.0")))
  }

  test("OSV semver: introduced+fixed") {
    val (aff, fix) = RangeExpr.osvToRanges(Nil,
      Seq(Seq(OsvEvent("1.0.0", ""), OsvEvent("", "1.2.3"))))
    assert(aff == Seq(OpVersion("gteq", "1.0.0"), OpVersion("andlt", "1.2.3")))
    assert(fix == Seq(OpVersion("gteq", "1.2.3")))
  }

  test("OSV semver: lone introduced 0") {
    val (aff, fix) = RangeExpr.osvToRanges(Nil, Seq(Seq(OsvEvent("0", ""))))
    assert(aff == Seq(OpVersion("gteq", "0")))
    assert(fix.isEmpty)
  }

  test("OSV custom ranges override + trailing zero closes over first version") {
    // mirror of CustomRanges_OverrideZeroIntroduced_SingleAffected
    val custom = Seq(Seq(
      OsvEvent("0.0.0-20230727023453-1c4957d53911", ""),
      OsvEvent("", "0.0.0-20251020133207-084a437033b4"),
      OsvEvent("5.2.0", ""), OsvEvent("", "5.3.0"),
      OsvEvent("5.3.0", ""), OsvEvent("", "5.3.5")))
    val semver = Seq(Seq(OsvEvent("0", "")))
    val (aff, _) = RangeExpr.osvToRanges(custom, semver)
    assert(aff == Seq(
      OpVersion("gteq", "0.0.0-20230727023453-1c4957d53911"),
      OpVersion("andlt", "0.0.0-20251020133207-084a437033b4"),
      OpVersion("orgteq", "5.2.0"), OpVersion("andlt", "5.3.0"),
      OpVersion("orgteq", "5.3.0"), OpVersion("andlt", "5.3.5"),
      OpVersion("orgteq", "0"),
      OpVersion("andlt", "0.0.0-20230727023453-1c4957d53911")))
  }

  test("OSV custom+semver with extra semver events") {
    // mirror of CustomAndSemverRanges_ZeroIntroducedWithExtraSemver
    val custom = Seq(Seq(
      OsvEvent("0.0.0-20230727023453-1c4957d53911", ""),
      OsvEvent("", "0.0.0-20251020133207-084a437033b4"),
      OsvEvent("5.2.0", ""), OsvEvent("", "5.3.0"),
      OsvEvent("5.3.0", ""), OsvEvent("", "5.3.5")))
    val semver = Seq(Seq(
      OsvEvent("0", ""), OsvEvent("1.0.0", ""), OsvEvent("", "1.2.3")))
    val (aff, _) = RangeExpr.osvToRanges(custom, semver)
    assert(aff == Seq(
      OpVersion("gteq", "0.0.0-20230727023453-1c4957d53911"),
      OpVersion("andlt", "0.0.0-20251020133207-084a437033b4"),
      OpVersion("orgteq", "5.2.0"), OpVersion("andlt", "5.3.0"),
      OpVersion("orgteq", "5.3.0"), OpVersion("andlt", "5.3.5"),
      OpVersion("orgteq", "0"), OpVersion("andlt", "1.0.0"),
      OpVersion("orgteq", "1.0.0"), OpVersion("andlt", "1.2.3")))
  }

  test("OSV multiple OR groups from custom ranges") {
    // mirror of CustomRanges_MultipleOrGroups
    val custom = Seq(Seq(
      OsvEvent("5.2.0", ""), OsvEvent("", "5.3.0"),
      OsvEvent("5.3.0", ""), OsvEvent("", "5.3.4")),
      Seq(OsvEvent("5.4.0", ""), OsvEvent("", "5.4.7")))
    val semver = Seq(Seq(OsvEvent("0", "")))
    val (aff, _) = RangeExpr.osvToRanges(custom, semver)
    assert(aff == Seq(
      OpVersion("gteq", "5.2.0"), OpVersion("andlt", "5.3.0"),
      OpVersion("orgteq", "5.3.0"), OpVersion("andlt", "5.3.4"),
      OpVersion("orgteq", "5.4.0"), OpVersion("andlt", "5.4.7"),
      OpVersion("orgteq", "0"), OpVersion("andlt", "5.2.0")))
  }

  test("NVD interval emission") {
    val (aff, fix) = RangeExpr.nvdIntervalsToTokens(Seq(
      RangeExpr.NvdInterval("1.0.0", "", "", "1.2.3"),
      RangeExpr.NvdInterval("", "2.0.0", "2.5.0", "")))
    assert(aff == Seq(">=1.0.0", "<1.2.3", "||>2.0.0", "<=2.5.0"))
    assert(fix == Seq(">=1.2.3", "||>2.5.0"))
  }

  test("chain evaluation") {
    val chain = RangeExpr.parseRangeExpr(">=1.3.0 <1.3.2 || >=1.4.0")
    assert(RangeExpr.contains(chain, "1.3.1"))
    assert(!RangeExpr.contains(chain, "1.3.2"))
    assert(!RangeExpr.contains(chain, "1.3.9"))
    assert(RangeExpr.contains(chain, "1.4.0"))
    assert(RangeExpr.contains(chain, "99.0"))
    assert(!RangeExpr.contains(Nil, "1.0"))
    // exact-equality opcode
    assert(RangeExpr.contains(Seq(OpVersion("", "2.0")), "2.0"))
    assert(!RangeExpr.contains(Seq(OpVersion("", "2.0")), "2.1"))
    // sentinel bounds travel via parseToken (the GHSA regex grammar
    // never carries sentinels; token parse does, cf. debian MaxVersion)
    assert(RangeExpr.contains(Seq(RangeExpr.parseToken("<#MAXV#")), "9999"))
    assert(!RangeExpr.contains(Seq(RangeExpr.parseToken(">#MINV#")), "#MINV#"))
  }
}
