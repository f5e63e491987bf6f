package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The fits-the-driver caps bound ONE query's residency; DriverBudget makes
  * that a JVM-wide budget — resident sections from concurrent sessions must
  * never overlap.
  */
class DriverBudgetSpec extends AnyFunSuite {
  test("concurrent resident sections serialize on the single permit") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (1 to 8).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = DriverBudget.withPermit {
          val n = inside.incrementAndGet()
          maxInside.getAndUpdate(m => math.max(m, n))
          Thread.sleep(5)
          inside.decrementAndGet()
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(maxInside.get() == 1, "two resident sections overlapped")
    assert(DriverBudget.peakHolders == 1)
  }

  test("the permit releases on failure — a throwing section cannot deadlock the next") {
    intercept[RuntimeException] {
      DriverBudget.withPermit { throw new RuntimeException("boom") }
    }
    assert(DriverBudget.withPermit { 42 } == 42)
  }
}
