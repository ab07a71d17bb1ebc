package graft.sources

/** Driver-side fetch-with-retry for the HTTP ingestion boundary (S1).
  *
  * The reference's BrightSky client wraps every API call in 3 attempts
  * with exponential backoff (reference `src/ingestion/brightsky_client.py:
  * 31-69`). This sandbox has no network, so the engine starts at the byte
  * boundary ([[Ingest.parseWeather]]) — but the retry policy itself is
  * pure control flow, so it lives here as an injectable utility: callers
  * hand it any `() => T` fetch thunk (HTTP, object-store read, flaky RPC).
  *
  * Runs on the DRIVER (or inside a `mapPartitions` fetch stage) — it is
  * deliberately not a Spark construct: task-level retries of whole
  * partitions are Spark's job; this guards a single remote call.
  */
object Retry {

  /** Invoke `fetch` up to `attempts` times, sleeping
    * `backoffMs * 2^(attempt-1)` between failures (100ms, 200ms, 400ms …
    * like the reference's `2 ** attempt` schedule). The final failure
    * rethrows. `sleep` is injectable so tests don't wait wall-clock.
    */
  def fetchWithRetry[T](attempts: Int = 3, backoffMs: Long = 100,
      sleep: Long => Unit = Thread.sleep)(fetch: () => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var attempt = 0
    var last: Throwable = null
    while (attempt < attempts) {
      try return fetch()
      catch {
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt < attempts) sleep(backoffMs << (attempt - 1))
      }
    }
    throw last
  }
}
