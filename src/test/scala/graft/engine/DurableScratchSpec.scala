package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** In-JVM restart simulation for the durable [[Scratch]] mode: the
  * resetForTest hook drops exactly the state a process exit drops (the
  * in-memory memo and root cache) while the durable root's disk state
  * — artifacts and completion markers — survives, so these tests pin
  * the cross-process reuse contract without forking a JVM. The REAL
  * two-process proof (sbt invoked twice, catalog re-registration
  * included) is `scripts/durable_check.sh`. */
class DurableScratchSpec extends AnyFunSuite {

  private def md5leaf(key: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(key.getBytes(UTF_8)).map("%02x".format(_)).mkString.take(16)
  }

  private def withDurableRoot(f: java.nio.file.Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_durable_spec")
    Scratch.durableRootOverride = Some(dir.toString)
    Scratch.resetForTest()
    try f(dir)
    finally {
      Scratch.durableRootOverride = None
      Scratch.resetForTest()
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("a second process reuses a first process's artifact: zero builds") {
    withDurableRoot { _ =>
      var builds = 0
      val p1 = Scratch.cached("dspec", "k1") { p =>
        builds += 1
        Files.createDirectories(Paths.get(p))
        Files.write(Paths.get(p, "data.txt"), "artifact-one".getBytes(UTF_8))
      }
      assert(builds == 1)
      // same process: in-memory memo hit
      val p1b = Scratch.cached("dspec", "k1")(_ => builds += 1)
      assert(p1b == p1 && builds == 1)

      Scratch.resetForTest() // "restart": memo gone, disk survives
      assert(Scratch.buildCount == 0)
      val p2 = Scratch.cached("dspec", "k1")(_ => builds += 1)
      assert(builds == 1, "second process must find the marker, not rebuild")
      assert(Scratch.buildCount == 0)
      assert(p2 == p1, "deterministic path must be identical across processes")
      assert(new String(Files.readAllBytes(Paths.get(p2, "data.txt")), UTF_8)
        == "artifact-one")
    }
  }

  test("crashed build (dir without marker) is cleared and rebuilt") {
    withDurableRoot { root =>
      // simulate a crash mid-build: partial artifact dir, no marker
      val partial = root.resolve("dspec2").resolve(md5leaf("k2"))
      Files.createDirectories(partial)
      Files.write(partial.resolve("junk.tmp"), "partial".getBytes(UTF_8))

      var sawDebris = false
      val p = Scratch.cached("dspec2", "k2") { pth =>
        sawDebris = Files.exists(Paths.get(pth, "junk.tmp"))
        Files.createDirectories(Paths.get(pth))
        Files.write(Paths.get(pth, "data.txt"), "good".getBytes(UTF_8))
      }
      assert(!sawDebris, "partial dir must be cleared before the rebuild")
      assert(!Files.exists(Paths.get(p, "junk.tmp")))
      assert(new String(Files.readAllBytes(Paths.get(p, "data.txt")), UTF_8)
        == "good")
    }
  }

  test("marker key mismatch (hash collision) fails loudly") {
    withDurableRoot { root =>
      val pfx = root.resolve("dspec3")
      Files.createDirectories(pfx)
      // forge a marker at k3's leaf recording a DIFFERENT key
      Files.write(pfx.resolve(s"${md5leaf("k3")}.done"),
        "some-other-key".getBytes(UTF_8))
      val e = intercept[IllegalStateException] {
        Scratch.cached("dspec3", "k3")(_ => ())
      }
      assert(e.getMessage.contains("collision"))
    }
  }

  test("orphaned marker (artifact dir removed externally) self-heals by rebuilding") {
    // round-12 review: a disk reaper that removes the artifact dir but
    // leaves the sibling .done file used to make cached() permanently
    // resolve to a path to nothing — the marker check must also require
    // the artifact itself
    withDurableRoot { _ =>
      var builds = 0
      def build(pth: String): Unit = {
        builds += 1
        Files.createDirectories(Paths.get(pth))
        Files.write(Paths.get(pth, "d"), "x".getBytes(UTF_8))
      }
      val p = Scratch.cached("dspec6", "k6")(build)
      assert(builds == 1)
      // external cleanup: artifact gone, marker left behind
      val s = Files.walk(Paths.get(p))
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
      Scratch.resetForTest() // "restart"
      val p2 = Scratch.cached("dspec6", "k6")(build)
      assert(builds == 2, "orphaned marker must rebuild, not serve a missing dir")
      assert(Files.exists(Paths.get(p2, "d")))
    }
  }

  test("waiters on a failed build see the builder's own exception type") {
    // round-12 review: the losing thread used to get a
    // CompletionException wrapper where the winner got the raw builder
    // error — type-directed error handling then depended on a race
    withDurableRoot { _ =>
      val entered = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val winner = new Thread(() => {
        try Scratch.cached("dspec7", "k7") { _ =>
          entered.countDown()
          release.await()
          throw new IllegalStateException("boom-k7")
        } catch { case _: Throwable => () }
      })
      winner.start()
      entered.await()
      @volatile var caught: Throwable = null
      val waiter = new Thread(() => {
        try { Scratch.cached("dspec7", "k7")(_ => ()); () }
        catch { case t: Throwable => caught = t }
      })
      waiter.start()
      Thread.sleep(200) // let the waiter park on the in-flight future
      release.countDown()
      winner.join()
      waiter.join()
      assert(caught != null, "waiter must observe the failure")
      assert(caught.isInstanceOf[IllegalStateException],
        s"waiter must see the builder's exception type, got: $caught")
      assert(caught.getMessage == "boom-k7")
    }
  }

  test("failed build leaves no marker and is retryable") {
    withDurableRoot { root =>
      intercept[RuntimeException] {
        Scratch.cached("dspec4", "k4")(_ => throw new RuntimeException("boom"))
      }
      assert(!Files.exists(root.resolve("dspec4").resolve(s"${md5leaf("k4")}.done")))
      val p = Scratch.cached("dspec4", "k4") { pth =>
        Files.createDirectories(Paths.get(pth))
        Files.write(Paths.get(pth, "ok"), "1".getBytes(UTF_8))
      }
      assert(Files.exists(Paths.get(p, "ok")))
    }
  }
}
