package graft

/** Standalone mock EVM node for CLI drives:
  * Test/runMain graft.MockRpcMain <maxBlock> — prints its endpoint. */
object MockRpcMain {
  def main(args: Array[String]): Unit = {
    val maxBlock = args.headOption.map(_.toLong).getOrElse(50L)
    val s = new MockRpcServer
    s.logs = (1L to maxBlock).map(b =>
      s.MockLog(b, if (b % 2 == 0) "0xeven" else "0xodd", 0))
    s.head = maxBlock
    println(s"[mockrpc] endpoint=${s.endpoint} head=$maxBlock")
    Thread.sleep(Long.MaxValue)
  }
}
