package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

/** Shared aggregation-buffer helpers. */
private[expressions] object AggBuffers {

  /** UTF8String from an UnsafeRow may point into task-reused buffers — copy
    * the bytes on retention. getBytes already returns a fresh array unless
    * the string spans its backing byte[] exactly; clone only in that case.
    * ONE implementation for every buffering aggregate (KMinStringsAgg,
    * CountByKeyAgg): the aliasing rule must not drift between copies.
    */
  def owned(v: UTF8String): UTF8String = {
    val bytes = v.getBytes
    if (bytes.asInstanceOf[AnyRef] eq v.getBaseObject)
      UTF8String.fromBytes(bytes.clone())
    else UTF8String.fromBytes(bytes)
  }
}
