package graft.gen

/** Paced replay driver — the reference Kafka producer's loop semantics
  * (kafka_event_producer.py:96-139) re-expressed sink-agnostically:
  * rows are loaded once, optionally shuffled, emitted at
  * `ratePerSecond` with a per-event delay, and the pass repeats (with a
  * reshuffle) when `loop` is set. A producer is inherently a
  * single-process driver utility — this is the one place a driver-side
  * loop is the right shape, not a distributed operator.
  *
  * Differences from the reference, by design:
  *  - the shuffle is a seeded Fisher-Yates (the reference uses
  *    `random.shuffle` with global RNG state) so replays are
  *    reproducible — determinism is part of this repo's test contract;
  *  - the sink is a pluggable callback: tests collect in memory, a
  *    deployment appends JSON-lines files into a landing directory
  *    consumed by `StreamingRevenue.fileJsonSource` (the offline
  *    transport), or wraps a Kafka producer send at deploy time;
  *  - pacing is injectable so tests do not sleep.
  */
object Replay {

  final case class Config(
      ratePerSecond: Double = 100.0,
      shuffle: Boolean = true,
      loop: Boolean = false,
      maxEvents: Long = Long.MaxValue,
      seed: Long = 42L)

  /** Replay `rows` through `send` under `config`; returns events sent.
    * With `loop = false` stops after one pass (or `maxEvents`,
    * whichever first); with `loop = true`, `maxEvents` must be finite
    * and bounds the run. */
  def run(rows: IndexedSeq[String], config: Config,
          send: String => Unit,
          sleepMillis: Long => Unit = Thread.sleep): Long = {
    require(!config.loop || config.maxEvents < Long.MaxValue,
      "looping replay needs a finite maxEvents bound")
    if (rows.isEmpty) return 0L // a looping replay of nothing must not spin
    val rnd = new scala.util.Random(config.seed)
    val delayMs =
      if (config.ratePerSecond > 0) (1000.0 / config.ratePerSecond).toLong
      else 0L
    var sent = 0L
    var pass = rows
    var done = false
    while (!done) {
      if (config.shuffle) pass = rnd.shuffle(pass)
      val it = pass.iterator
      while (it.hasNext && sent < config.maxEvents) {
        send(it.next())
        sent += 1
        if (delayMs > 0 && sent < config.maxEvents) sleepMillis(delayMs)
      }
      done = !config.loop || sent >= config.maxEvents
    }
    sent
  }

  /** Landing-directory sink: batches events into numbered JSON-lines
    * files (`events-00000.json`, ...) that
    * `StreamingRevenue.fileJsonSource` discovers incrementally. Call
    * `flush()` after `run` to write the final partial batch. */
  final class FileSink(dir: String, batchSize: Int = 100) {
    require(batchSize > 0, "batchSize must be positive")
    private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    private var fileNo = 0
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))

    val send: String => Unit = { line =>
      buf += line
      if (buf.size >= batchSize) flush()
    }

    def flush(): Unit = if (buf.nonEmpty) {
      val path = java.nio.file.Paths.get(dir, f"events-$fileNo%05d.json")
      val tmp = java.nio.file.Paths.get(dir, f".events-$fileNo%05d.json.tmp")
      java.nio.file.Files.write(tmp,
        buf.mkString("", "\n", "\n").getBytes("UTF-8"))
      // atomic rename so the streaming file source never reads a
      // half-written file (same contract as a Kafka commit)
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      buf.clear()
      fileNo += 1
    }
  }
}
