package graft.util

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session Hadoop configuration, so executor
  * tasks open filesystems with the SAME settings the driver configured
  * (fs.s3a credentials/endpoints wired by FileBackends.configure). A bare
  * `new Configuration()` on the executor loads only classpath defaults and
  * silently drops those — fine on local disk, AccessDenied on an object
  * store. (Spark has an identical internal wrapper, but it is
  * private[spark].)
  *
  * Snapshotted into a plain string array at construction instead of
  * writeObject/readObject hooks, so it round-trips under ANY serializer:
  * if a session sets spark.serializer=Kryo, broadcast/closure values skip
  * Java-serialization hooks, but plain fields always copy.
  */
final class HadoopConf(@transient c0: Configuration)
    extends Serializable {
  // @volatile: `value` uses double-checked locking and this instance is
  // shared by every concurrent task thread in an executor JVM — without
  // the volatile publish, a racing reader can observe a partially
  // constructed Configuration.
  @transient @volatile private var conf: Configuration = c0
  private val entries: Array[Array[String]] = {
    val buf = scala.collection.mutable.ArrayBuffer[Array[String]]()
    val it = conf.iterator()
    while (it.hasNext) { val e = it.next(); buf += Array(e.getKey, e.getValue) }
    buf.toArray
  }
  def value: Configuration = {
    if (conf == null) synchronized {
      if (conf == null) {
        val c = new Configuration(false)
        entries.foreach(e => c.set(e(0), e(1)))
        conf = c
      }
    }
    conf
  }
}

object HadoopConf {
  def apply(conf: Configuration): HadoopConf = new HadoopConf(conf)
}
