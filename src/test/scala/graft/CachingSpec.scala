package graft

import graft.util.CacheScope

class CachingSpec extends SparkSpec {
  import spark.implicits._

  test("releaseAll deregisters swept scopes and re-caching re-registers them") {
    val ds = Seq(1, 2).toDF("x")
    CacheScope.shared.cache(ds)
    ds.count()
    assert(ds.storageLevel.useMemory)
    CacheScope.releaseAll()
    assert(!ds.storageLevel.useMemory)
    // the sweep DEREGISTERED this thread's default scope (bounded set —
    // dead pool threads' empty scopes don't accumulate); caching into
    // it again must re-register it, so a SECOND sweep still reaches it
    val ds2 = Seq(3).toDF("x")
    CacheScope.shared.cache(ds2)
    ds2.count()
    assert(ds2.storageLevel.useMemory)
    CacheScope.releaseAll()
    assert(!ds2.storageLevel.useMemory)
  }

  test("caller-owned scopes never enter the releaseAll sweep") {
    val own = new CacheScope
    val ds = Seq(1).toDF("x")
    own.cache(ds)
    ds.count()
    CacheScope.releaseAll()
    assert(ds.storageLevel.useMemory) // untouched: lifecycle is the caller's
    own.release()
    assert(!ds.storageLevel.useMemory)
  }
}
