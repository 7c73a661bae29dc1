package graft.streaming

import graft.SparkSpec
import graft.cdc.ChangeGen
import java.nio.file.Files

/** Bucket-layout contract: the marker is stamped on first write, a
  * mismatched scheme or bucket count refuses instead of silently
  * stranding keys in old-scheme buckets, and an unmarked legacy layout
  * refuses because its scheme is unknowable. */
class BucketSchemeSpec extends SparkSpec {

  test("first use stamps the marker; same scheme keeps passing") {
    val dir = Files.createTempDirectory("graft-scheme").toString
    BucketScheme.ensure(dir, BucketScheme.Murmur3Pmod, 16)
    assert(new java.io.File(dir, BucketScheme.MarkerName).exists())
    BucketScheme.ensure(dir, BucketScheme.Murmur3Pmod, 16) // idempotent
  }

  test("changed bucket count or hash scheme refuses") {
    val dir = Files.createTempDirectory("graft-scheme2").toString
    BucketScheme.ensure(dir, BucketScheme.Murmur3Pmod, 16)
    val e1 = intercept[IllegalStateException] {
      BucketScheme.ensure(dir, BucketScheme.Murmur3Pmod, 32)
    }
    assert(e1.getMessage.contains("bucket-scheme mismatch"))
    val e2 = intercept[IllegalStateException] {
      BucketScheme.ensure(dir, "xxhash64-pmod", 16)
    }
    assert(e2.getMessage.contains("bucket-scheme mismatch"))
  }

  test("unmarked legacy bucket layout refuses") {
    val dir = Files.createTempDirectory("graft-scheme3").toString
    new java.io.File(dir, "bucket=0").mkdirs() // pre-marker layout
    val e = intercept[IllegalStateException] {
      BucketScheme.ensure(dir, BucketScheme.Murmur3Pmod, 16)
    }
    assert(e.getMessage.contains("unmarked bucketed layout"))
  }

  test("the bucketed CDC sink stamps its scheme and refuses a different bucket count next batch") {
    val snap = Files.createTempDirectory("graft-scheme-sink").toString + "/snap"
    val events = ChangeGen.changeEvents(spark, sfDir).limit(50)
    CdcStream.upsertBatchBucketed(spark, snap, nBuckets = 8)(
      CdcStream.decode(events), 0L)
    assert(new java.io.File(snap, BucketScheme.MarkerName).exists())
    intercept[IllegalStateException] {
      CdcStream.upsertBatchBucketed(spark, snap, nBuckets = 16)(
        CdcStream.decode(events), 1L)
    }
  }
}
