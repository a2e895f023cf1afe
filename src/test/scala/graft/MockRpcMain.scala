package graft

/** Standalone mock EVM node for CLI drives:
  * Test/runMain graft.MockRpcMain <maxBlock> [advanceMs [untilBlock]]
  * — prints its endpoint. With `advanceMs` the chain keeps producing:
  * every `advanceMs` the head advances one block and a new log lands,
  * up to `untilBlock` (default maxBlock+100) — the live-tail stand-in
  * for a subscriptions/tail-follow drive. */
object MockRpcMain {
  def main(args: Array[String]): Unit = {
    val maxBlock = args.headOption.map(_.toLong).getOrElse(50L)
    val advanceMs = args.lift(1).map(_.toLong)
    val untilBlock = args.lift(2).map(_.toLong).getOrElse(maxBlock + 100)
    val s = new MockRpcServer
    def logAt(b: Long) = s.MockLog(b, if (b % 2 == 0) "0xeven" else "0xodd", 0)
    s.logs = (1L to maxBlock).map(logAt)
    s.head = maxBlock
    println(s"[mockrpc] endpoint=${s.endpoint} head=$maxBlock" +
      advanceMs.map(ms => s" advancing every ${ms}ms until $untilBlock").getOrElse(""))
    advanceMs.foreach { ms =>
      while (s.head < untilBlock) {
        Thread.sleep(ms)
        val b = s.head + 1
        s.logs = s.logs :+ logAt(b)
        s.head = b
        if (b % 10 == 0) println(s"[mockrpc] head=$b")
      }
    }
    Thread.sleep(Long.MaxValue)
  }
}
