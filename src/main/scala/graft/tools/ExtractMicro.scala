package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.functions.HtmlTextBytes
import graft.sources.{PageGen, PageGenConfig}

/** Raw multi-thread scaling of the byte-level extractor (no Spark). */
object ExtractMicro {
  def main(args: Array[String]): Unit = {
    val nPerThread = if (args.nonEmpty) args(0).toInt else 20000
    val cfg = PageGenConfig(nPages = 1000000L, nHosts = 2000, paraMult = 6)
    val bounds = PageGen.hostBoundaries(cfg)
    // pre-generate a pool of pages (same bytes for all threads)
    val pool = Array.tabulate(2000)(i => PageGen.genPage(cfg, bounds, i * 37L).html)
    val poolBytes = pool.map(_.length.toLong).sum

    // no-allocation baseline: pure byte-scan (sums bytes, no output array)
    for (threads <- Seq(8, 32, 8, 32)) {
      val sink = new AtomicLong()
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var acc = 0L
          var i = 0
          while (i < nPerThread) {
            val a = pool((i + t * 131) % pool.length)
            var j = 0
            while (j < a.length) { acc += a(j); j += 1 }
            i += 1
          }
          sink.addAndGet(acc)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val pages = threads.toLong * nPerThread
      val gb = pages * (poolBytes / pool.length) / 1e9
      println(f"[micro] SCAN threads=$threads wall=$sec%.2f pps=${pages / sec}%.0f in_gbps=${gb / sec}%.2f (s=${sink.get()%10})")
    }

    for (threads <- Seq(1, 8, 32, 8, 32)) {
      val sink = new AtomicLong()
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          var acc = 0L
          var i = 0
          while (i < nPerThread) {
            acc += HtmlTextBytes.extract(pool((i + t * 131) % pool.length)).length
            i += 1
          }
          sink.addAndGet(acc)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val pages = threads.toLong * nPerThread
      val gb = pages * (poolBytes / pool.length) / 1e9
      println(f"[micro] threads=$threads pages=$pages wall=$sec%.2f pps=${pages / sec}%.0f in_gbps=${gb / sec}%.2f (sink=${sink.get()%1000})")
    }
  }
}
