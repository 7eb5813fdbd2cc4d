package graft

import graft.sources.LoaderFixtures

/** Guards fixture drift: the committed binary fixtures must stay
  * byte-identical to what [[LoaderFixtures]] generates — editing the
  * generator without re-running `runMain graft.sources.LoaderFixtures
  * fixtures` (or vice versa) fails here instead of silently gating
  * queries on stale bytes. */
class LoaderFixturesSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("committed fixtures are byte-identical to the generator output") {
    LoaderFixtures.all.foreach { case (rel, bytes) =>
      val committed = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"fixtures/$rel"))
      assert(java.util.Arrays.equals(committed, bytes),
        s"fixtures/$rel differs from LoaderFixtures output — regenerate " +
          "with: sbt \"runMain graft.sources.LoaderFixtures fixtures\"")
    }
    assert(LoaderFixtures.all.size == 35)
  }
}
