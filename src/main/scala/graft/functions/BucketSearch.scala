package graft.functions

/** Static binary search for [[LowerBoundBucket]]'s generated code: the
  * number of sorted bounds strictly less than `id` (0 ≤ result ≤
  * bounds.length).
  */
object BucketSearch {
  def bucket(bounds: Array[Long], id: Long): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < id) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Double-bounds twin (for [[LowerBoundBucketD]]). */
  def bucketD(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
