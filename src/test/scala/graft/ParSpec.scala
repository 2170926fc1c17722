package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Par]] is the r16 branch-overlap primitive under the experiment
  * operators (permutedPqUpliftStats, pairSetEval, canaryRecallStats):
  * results must be position-stable and a branch failure must surface
  * as the ORIGINAL exception (not the pool's ExecutionException
  * wrapper), because callers and specs match on exception classes. */
class ParSpec extends AnyFunSuite {

  test("sections returns both branch values in position") {
    assert(Par.sections(1 + 1, "b") === ((2, "b")))
  }

  test("sections3 evaluates all three branches") {
    val (a, b, c) = Par.sections3({ Thread.sleep(5); "a" }, 42L, Seq(3))
    assert(a === "a" && b === 42L && c === Seq(3))
  }

  test("a pool-branch failure rethrows the original exception class") {
    val boom = intercept[IllegalStateException] {
      Par.sections(throw new IllegalStateException("branch a died"), 7)
    }
    assert(boom.getMessage === "branch a died")
  }

  test("a caller-thread-branch failure propagates unchanged") {
    val zero = "".length // runtime zero the constant-folder cannot see
    intercept[ArithmeticException] {
      Par.sections3(1, 2, 1 / zero)
    }
  }

  test("nested sections cannot deadlock (one branch per level runs on " +
      "the caller's thread; the pool is unbounded)") {
    val ((a, b), c) = Par.sections(Par.sections("x", "y"), "z")
    assert(a === "x" && b === "y" && c === "z")
  }
}
