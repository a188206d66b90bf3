package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for the session Hadoop configuration, so executor
  * tasks open filesystems with the SAME settings the driver configured
  * (fs.s3a credentials/endpoints wired by FileBackends.configure). A bare
  * `new Configuration()` on the executor loads only classpath defaults and
  * silently drops those — fine on local disk, AccessDenied on an object
  * store. (Spark has an identical internal wrapper, but it is
  * private[spark].)
  */
final class HadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object HadoopConf {
  def apply(conf: Configuration): HadoopConf = new HadoopConf(conf)
}
