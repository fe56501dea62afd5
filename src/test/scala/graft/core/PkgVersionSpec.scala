package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden + property tests for the dpkg version ordering — the single
  * most correctness-critical leaf (SURVEY §1.3). Golden cases from
  * FIXTURES.md §14 / reference common/version.go semantics.
  * Properties use a seeded generator (scalatestplus isn't in the
  * offline cache, so no forAll integration). */
class PkgVersionSpec extends AnyFunSuite {

  private def cmp(a: String, b: String): Int = PkgVersion.compareRaw(a, b)

  test("epoch dominates") {
    assert(cmp("2:1.0-1", "1:9.9-9") > 0)
    assert(cmp("0:1.0", "1.0") == 0)
  }

  test("tilde sorts before everything") {
    assert(cmp("1.0~rc1", "1.0") < 0)
    assert(cmp("1.0~~", "1.0~") < 0)
    assert(cmp("1.0~rc1", "1.0~rc2") < 0)
  }

  test("el-suffix quirk: dot beats underscore") {
    assert(cmp("2.9.1-6.el7.4", "2.9.1-6.el7_2.2") > 0)
    assert(cmp("2.9.1-6.el7_2.2", "2.9.1-6.el7.4") < 0)
  }

  test("rc/pre demotion quirk") {
    assert(cmp("1.6_rc1-r0", "1.6-r1") < 0)
    assert(cmp("1.6-r1", "1.6_rc1-r0") > 0)
    assert(cmp("1.6_pre2-r0", "1.6-r1") < 0)
  }

  test("sentinels bound everything") {
    for (v <- Seq("0", "1.0", "999:999", "0.0.1~~~", "#MINV#", "#MAXV#")) {
      assert(cmp("#MINV#", v) <= 0)
      assert(cmp("#MAXV#", v) >= 0)
    }
    assert(cmp("#MINV#", "#MAXV#") < 0)
    assert(cmp("#MINV#", "#MINV#") == 0)
    assert(cmp("#MAXV#", "#MAXV#") == 0)
  }

  test("numeric segments compare numerically, zeros skipped") {
    assert(cmp("1.10", "1.9") > 0)
    assert(cmp("1.01", "1.1") == 0)
    assert(cmp("10", "9") > 0)
    assert(cmp("0.5", "0.50") < 0) // digit-run length decides after firstDiff=0
  }

  test("style zoo parses and orders") {
    assert(cmp("1.0.2o-r0", "1.0.2n-r0") > 0) // alpine letter suffix
    assert(cmp("0:2.4.46-10.el8", "2.4.46-9.el8") > 0) // epoch+el
    assert(PkgVersion.parse("2:svn28991.0-45.el7").isRight) // non-digit start
    assert(cmp("2.4.45+dfsg-1ubuntu1.10", "2.4.45+dfsg-1ubuntu1.9") > 0)
  }

  test("parse decomposition") {
    val v = PkgVersion.parse("2:1.2.3-4ubuntu5.el7_2").toOption.get
    assert(v.epoch == 2)
    assert(v.version == "1.2.3")
    assert(v.revision == "4ubuntu5")
    assert(v.elVer == "el7_2")
    assert(v.render == "2:1.2.3-4ubuntu5.el7_2")
  }

  test("parse rejections") {
    assert(PkgVersion.parse("").isLeft)
    assert(PkgVersion.parse("N/A").isLeft)
    assert(PkgVersion.parse("NA").isLeft)
    assert(PkgVersion.parse("-1:1.0").isLeft) // negative epoch
    assert(PkgVersion.parse("x:1.0").isLeft) // non-numeric epoch
    assert(PkgVersion.parse("1 0").isLeft) // invalid char
  }

  private def genVersion(r: scala.util.Random): String = {
    val epoch = Seq("", "", "", "1:", "2:")(r.nextInt(5))
    val segs = Seq.fill(1 + r.nextInt(4))(r.nextInt(100)).mkString(".")
    val suffix = Seq("", "", "~rc1", "a", "+b1", "~")(r.nextInt(6))
    val rev = Seq("", "", "-1", "-0ubuntu3", "-6.el7_2")(r.nextInt(5))
    epoch + segs + suffix + rev
  }

  test("property: total order laws (seeded, 2000 triples)") {
    val r = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val (a, b, c) = (genVersion(r), genVersion(r), genVersion(r))
      assert(Integer.signum(cmp(a, b)) == -Integer.signum(cmp(b, a)), s"antisym $a $b")
      assert(cmp(a, a) == 0, s"refl $a")
      if (cmp(a, b) <= 0 && cmp(b, c) <= 0)
        assert(cmp(a, c) <= 0, s"trans $a $b $c")
    }
  }

  test("property: numeric dotted subdomain matches numeric ordering (seeded)") {
    val r = new scala.util.Random(7)
    val ord = Ordering.Implicits.seqOrdering[Seq, Int]
    for (_ <- 1 to 2000) {
      val a = Seq.fill(3)(r.nextInt(500))
      val b = Seq.fill(3)(r.nextInt(500))
      val expected = Integer.signum(ord.compare(a, b))
      assert(Integer.signum(cmp(a.mkString("."), b.mkString("."))) == expected, s"$a vs $b")
    }
  }
}
