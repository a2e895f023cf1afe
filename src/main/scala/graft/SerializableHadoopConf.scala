package graft

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, so
  * executor-side tasks (the tar-shard writer's `foreachPartition`,
  * the tar DSv2 reader factory) can resolve `FileSystem` instances
  * with the DRIVER'S configuration — credentials, `fs.defaultFS`,
  * scheme→impl bindings — instead of whatever defaults the executor
  * JVM happens to load. `Configuration` itself is `Writable` but not
  * `Serializable`; this is the standard bridge (Spark keeps an
  * equivalent private class for the same reason). */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
