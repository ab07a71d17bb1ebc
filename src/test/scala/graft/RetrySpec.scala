package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Retry

/** S1's retry policy (reference `brightsky_client.py:31-69`): 3 attempts,
  * exponential backoff, final failure rethrown.
  */
class RetrySpec extends AnyFunSuite {

  test("succeeds after transient failures, with exponential backoff") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Retry.fetchWithRetry(attempts = 3, backoffMs = 100, sleep = sleeps += _) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException(s"flaky #$calls")
      "payload"
    }
    assert(out === "payload")
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(100L, 200L))
  }

  test("first-try success never sleeps") {
    var slept = false
    val out = Retry.fetchWithRetry(sleep = _ => slept = true)(() => 42)
    assert(out === 42 && !slept)
  }

  test("exhausted attempts rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.fetchWithRetry(attempts = 3, sleep = _ => ()) { () =>
        calls += 1; throw new RuntimeException(s"down #$calls")
      }
    }
    assert(e.getMessage === "down #3")
    assert(calls === 3)
  }
}
