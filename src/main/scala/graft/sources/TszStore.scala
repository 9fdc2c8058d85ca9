package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m3tsz block codec — the reference's at-rest compression, made
  * real: each (series, UTC-day block) encodes to ONE binary blob,
  * timestamps as delta-of-delta in MICROSECONDS (scheme.go:47
  * defaultTimeEncodingSchemes[Microsecond]: the 7/9/12-bit dod
  * buckets behind 10/110/1110 opcodes with a 64-bit default behind
  * 1111 — micros keep the round trip exact where the seconds scheme
  * would truncate), values through the int-optimized diff encoder
  * (encoder.go:112-260, int_sig_bits_tracker.go) — the SAME state
  * machine `Temporal.tszValueCost` costs, so the cost card is this
  * codec's exact bit accounting (asserted in TszSpec).
  *
  * Deviations, both documented at the call sites: (1) the first
  * sample writes a full 64-bit stamp and the second's dod measures
  * against Δ₀ = 0 — the cost model's block-header simplification,
  * self-consistent between encode and decode; (2) values that fail
  * int conversion throw instead of falling back to float-XOR mode
  * (nothing in the corpus hits it at any SF; a silent float path
  * would diverge from the cost card unnoticed).
  *
  * The codec is deliberately imperative Scala (bit twiddling has no
  * declarative form); it runs per (series, block) inside mapGroups,
  * the block being m3db's own bounded working set.
  */
object Tsz {

  final class BitWriter(initialBytes: Int = 256) {
    private var buf = new Array[Byte](math.max(8, initialBytes))
    private var nBits: Long = 0L
    def bits: Long = nBits
    def writeBit(b: Long): Unit = writeBits(b, 1)
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        val pos = nBits
        val byteIdx = (pos >>> 3).toInt
        if (byteIdx >= buf.length)
          buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        if (((v >>> i) & 1L) != 0L)
          buf(byteIdx) = (buf(byteIdx) | (0x80 >>> (pos & 7L).toInt)).toByte
        nBits += 1
        i -= 1
      }
    }
    def toBytes: Array[Byte] =
      java.util.Arrays.copyOf(buf, ((nBits + 7) >>> 3).toInt)
  }

  final class BitReader(bytes: Array[Byte]) {
    private var pos = 0L
    def readBit(): Long = {
      val b = ((bytes((pos >>> 3).toInt) >>> (7 - (pos & 7L).toInt)) & 1).toLong
      pos += 1
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  private val MaxMult = 6

  /** Smallest multiplier in [curMax, 6] making v·10^m integral —
    * the 1e-6-tolerance mirror of Temporal.tszValueCost.m0 (rint vs
    * HALF_UP is immaterial: the tolerance keeps scaled values ≫1e-6
    * away from .5 boundaries). -1 = not int-convertible. */
  private def multOf(v: Double, curMax: Int): Int = {
    var m = curMax
    while (m <= MaxMult) {
      val scaled = v * math.pow(10, m)
      if (math.abs(scaled - math.rint(scaled)) < 1e-6) return m
      m += 1
    }
    -1
  }

  private def numSig(x: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(x)

  private def signExtend(v: Long, bits: Int): Long =
    (v << (64 - bits)) >> (64 - bits)

  /** Encode one block. `pts` = (tsMicros, value) in time order.
    * Returns (bytes, tsBits, valBits); tsBits + valBits = total
    * stream bits. Throws on a non-int-convertible value. */
  def encodeBlock(pts: Array[(Long, Double)]): (Array[Byte], Long, Long) = {
    val w = new BitWriter(math.max(64, pts.length * 4))
    var tsBits = 0L
    var valBits = 0L
    var prevTs = 0L
    var prevDelta = 0L
    var maxMult = 0
    var sigT = 0      // tracker NumSig
    var curHi = 0     // tracker CurHighestLowerSig
    var nLower = 0    // tracker NumLowerSig
    var intVal = 0L

    // WriteIntSig (int_sig_bits_tracker.go:49): update marker + the
    // new count when it changed, bare no-update bit otherwise
    def writeIntSig(sig: Int): Unit = {
      if (sigT != sig) {
        w.writeBit(1)
        if (sig == 0) w.writeBit(0)
        else { w.writeBit(1); w.writeBits((sig - 1).toLong, 6) }
      } else w.writeBit(0)
      sigT = sig
    }

    // TrackNewSig (int_sig_bits_tracker.go:70): grow immediately,
    // collapse after 5 consecutive diffs ≥3 bits below to the run's
    // highest; a growth step leaves NumLowerSig untouched
    def trackNewSig(nsig: Int): Int = {
      var newSig = sigT
      if (nsig > sigT) newSig = nsig
      else if (sigT - nsig >= 3) {
        if (nLower == 0) curHi = nsig
        else if (nsig > curHi) curHi = nsig
        nLower += 1
        if (nLower >= 5) { newSig = curHi; nLower = 0 }
      } else nLower = 0
      newSig
    }

    var i = 0
    while (i < pts.length) {
      val (ts, v) = pts(i)
      // ---- timestamp half (micros dod buckets) ----
      val t0 = w.bits
      if (i == 0) w.writeBits(ts, 64)
      else {
        val d = ts - prevTs
        val dod = d - prevDelta
        if (dod == 0L) w.writeBit(0)
        else if (dod >= -64 && dod <= 63) {
          w.writeBits(0x2, 2); w.writeBits(dod & 0x7fL, 7)
        } else if (dod >= -256 && dod <= 255) {
          w.writeBits(0x6, 3); w.writeBits(dod & 0x1ffL, 9)
        } else if (dod >= -2048 && dod <= 2047) {
          w.writeBits(0xe, 4); w.writeBits(dod & 0xfffL, 12)
        } else {
          w.writeBits(0xf, 4); w.writeBits(dod, 64)
        }
        prevDelta = d
      }
      prevTs = ts
      tsBits += w.bits - t0

      // ---- value half (int-optimized diff encoder) ----
      val v0 = w.bits
      val m = multOf(v, maxMult)
      require(m >= 0, s"value $v not int-convertible at mult<=6 " +
        "(float-XOR fallback deliberately unimplemented)")
      val sv = math.rint(v * math.pow(10, m)).toLong
      if (i == 0) {
        w.writeBit(0) // opcodeIntMode
        val sig = numSig(math.abs(sv))
        writeIntSig(sig)
        if (m > 0) { w.writeBit(1); w.writeBits(m.toLong, 3); maxMult = m }
        else w.writeBit(0)
        w.writeBit(if (sv < 0) 1L else 0L)
        w.writeBits(math.abs(sv), sigT)
        intVal = sv
      } else {
        val diff = intVal - sv
        if (diff == 0L && m == maxMult) {
          w.writeBit(0); w.writeBit(1) // opcodeUpdate + opcodeRepeat
        } else {
          val nsig = numSig(math.abs(diff))
          val newSig = trackNewSig(nsig)
          if (m > maxMult || sigT != newSig) {
            w.writeBit(0); w.writeBit(0); w.writeBit(0) // upd, noRep, int
            writeIntSig(newSig)
            if (m > maxMult) { w.writeBit(1); w.writeBits(m.toLong, 3); maxMult = m }
            else w.writeBit(0)
            w.writeBit(if (diff < 0) 1L else 0L)
            w.writeBits(math.abs(diff), sigT)
          } else {
            w.writeBit(1) // opcodeNoUpdate
            w.writeBit(if (diff < 0) 1L else 0L)
            w.writeBits(math.abs(diff), sigT)
          }
          intVal = sv
        }
      }
      valBits += w.bits - v0
      i += 1
    }
    (w.toBytes, tsBits, valBits)
  }

  /** Decode a block of `n` points — the exact mirror. */
  def decodeBlock(bytes: Array[Byte], n: Int): Array[(Long, Double)] = {
    val r = new BitReader(bytes)
    val out = new Array[(Long, Double)](n)
    var prevTs = 0L
    var prevDelta = 0L
    var mult = 0
    var sig = 0
    var intVal = 0L

    def readIntSig(): Unit =
      if (r.readBit() == 1L) {
        sig = if (r.readBit() == 0L) 0 else (r.readBits(6) + 1).toInt
      }

    def readSignedDiff(): Long = {
      val neg = r.readBit() == 1L
      val mag = r.readBits(sig)
      if (neg) -mag else mag
    }

    var i = 0
    while (i < n) {
      // ---- timestamp ----
      if (i == 0) prevTs = r.readBits(64)
      else {
        val dod =
          if (r.readBit() == 0L) 0L
          else if (r.readBit() == 0L) signExtend(r.readBits(7), 7)
          else if (r.readBit() == 0L) signExtend(r.readBits(9), 9)
          else if (r.readBit() == 0L) signExtend(r.readBits(12), 12)
          else r.readBits(64)
        prevDelta += dod
        prevTs += prevDelta
      }
      // ---- value ----
      if (i == 0) {
        require(r.readBit() == 0L, "float-mode block (unsupported)")
        readIntSig()
        if (r.readBit() == 1L) mult = r.readBits(3).toInt
        intVal = readSignedDiff() // first value: sign + magnitude
      } else {
        val b0 = r.readBit()
        if (b0 == 1L) intVal -= readSignedDiff() // noUpdate step
        else if (r.readBit() == 1L) () // repeat: state unchanged
        else {
          require(r.readBit() == 0L, "float-mode transition (unsupported)")
          readIntSig()
          if (r.readBit() == 1L) mult = r.readBits(3).toInt
          intVal -= readSignedDiff()
        }
      }
      out(i) = (prevTs, intVal.toDouble / math.pow(10, mult))
      i += 1
    }
    out
  }
}

/** At-rest m3tsz block store: events → one encoded binary blob per
  * (series, UTC-day block), persisted bucketed by series so the
  * decode path reads shuffle-free — the Spark-native restatement of
  * m3db's block-per-series-per-window file layout
  * (src/dbnode/storage/series). Readers decode blocks back to
  * samples with `flatMap` over the block rows; the blob is opaque to
  * Catalyst, so predicates prune on the (name, user_id, block)
  * columns exactly like m3db seeks by (series, block start).
  *
  * Scale: encoding shuffles once on the block key into mapGroups
  * (per-group state = one block, m3db's own working set — the
  * 10-point and 10M-point corpora cost the same per-executor
  * memory); the table write buckets by series; decode is a map-side
  * flatMap over pruned block rows. */
object TszStore {

  /** (name, user_id, block, n, ts_bits, val_bits, blk) — one encoded
    * row per (series, UTC-day). */
  def blockFrame(samples0: DataFrame): DataFrame = {
    val spark = samples0.sparkSession
    import spark.implicits._
    // streamed frames (Ingest.Sample) carry no event_id; the
    // tiebreak only orders same-timestamp points inside a block
    val samples =
      if (samples0.columns.contains("event_id")) samples0
      else samples0.withColumn("event_id", lit(0L))
    val ds = samples.where(col("value").isNotNull)
      .select(col("name"), col("user_id"),
        floor(unix_timestamp(col("ts")).cast("double") / 86400.0)
          .cast("long").as("block"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(String, Long, Long, Long, Long, Double)]
    ds.groupByKey(t => (t._1, t._2, t._3))
      .mapGroups { (key: (String, Long, Long),
                    it: Iterator[(String, Long, Long, Long, Long, Double)]) =>
        val pts = it.toArray.sortBy(t => (t._4, t._5)).map(t => (t._4, t._6))
        val (bytes, tsBits, valBits) = Tsz.encodeBlock(pts)
        (key._1, key._2, key._3, pts.length, tsBits, valBits, bytes)
      }
      .toDF("name", "user_id", "block", "n", "ts_bits", "val_bits", "blk")
  }

  /** Persist the block frame, bucketed by series (idempotent —
    * SeriesStore's drop-table-and-location discipline). */
  def write(samples: DataFrame, table: String, buckets: Int = 8): Unit = {
    val spark = samples.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    blockFrame(samples)
      .write.mode("overwrite")
      .bucketBy(buckets, "name", "user_id")
      .sortBy("name", "user_id", "block")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append one micro-batch as encoded blocks. A (series, day) split
    * across micro-batches lands MULTIPLE blobs under one block key —
    * m3db's pre-compaction block versions; [[readDecoded]] decodes
    * and unions all of them, [[compact]] folds each key back to one
    * blob. */
  def appendBatch(batch: DataFrame, table: String, buckets: Int = 8): Unit = {
    val spark = batch.sparkSession
    val exists = spark.catalog.tableExists(table)
    if (!exists) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val mode = if (exists) "append" else "errorifexists"
    blockFrame(batch).write.mode(mode)
      .bucketBy(buckets, "name", "user_id")
      .sortBy("name", "user_id", "block")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Continuous ingest — m3db's commit-log → flush path over
    * Structured Streaming: each micro-batch encodes and appends its
    * blocks (exactly-once per batch under the checkpoint). */
  def streamWrite(samples: DataFrame, table: String, checkpoint: String,
                  buckets: Int = 8): org.apache.spark.sql.streaming.StreamingQuery =
    samples.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, table, buckets)
      }
      .start()

  /** Background compaction (m3db src/dbnode/storage/compaction,
    * restated for blocks): decode every blob of each (series, block)
    * key, merge the points in time order, re-encode to exactly ONE
    * blob. Same-timestamp points from different blobs merge in
    * (ts, value) order — the point SET is preserved exactly; only
    * the intra-second byte order may differ from the batch path.
    * localCheckpoint snapshots the merge so the table being read can
    * be overwritten. */
  def compact(spark: SparkSession, table: String, buckets: Int = 8): Unit = {
    import spark.implicits._
    val merged = spark.table(table)
      .select(col("name"), col("user_id"), col("block"), col("n"),
        col("blk"))
      .as[(String, Long, Long, Int, Array[Byte])]
      .groupByKey(t => (t._1, t._2, t._3))
      .mapGroups { (key: (String, Long, Long),
                    it: Iterator[(String, Long, Long, Int, Array[Byte])]) =>
        val pts = it.flatMap(t => Tsz.decodeBlock(t._5, t._4))
          .toArray.sortBy(p => (p._1, p._2))
        val (bytes, tsBits, valBits) = Tsz.encodeBlock(pts)
        (key._1, key._2, key._3, pts.length, tsBits, valBits, bytes)
      }
      .toDF("name", "user_id", "block", "n", "ts_bits", "val_bits", "blk")
      .localCheckpoint(true)
    val cols = spark.table(table).columns
    merged.repartition(buckets, col("name"), col("user_id"))
      .select(cols.map(col): _*)
      .write.mode("overwrite").insertInto(table)
  }

  /** Decode the stored blocks back to a sample frame
    * (name, user_id, ts, value). `fromBlock`/`untilBlock` prune on
    * the block column before any blob is touched. */
  def readDecoded(spark: SparkSession, table: String,
                  fromBlock: Option[Long] = None,
                  untilBlock: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val t = spark.table(table)
    val bounded = Seq(
      fromBlock.map(b => col("block") >= b),
      untilBlock.map(b => col("block") < b)).flatten
      .foldLeft(t)((df, p) => df.where(p))
    bounded.select(col("name"), col("user_id"), col("n"), col("blk"))
      .as[(String, Long, Int, Array[Byte])]
      .flatMap { case (n, u, cnt, bytes) =>
        Tsz.decodeBlock(bytes, cnt).iterator.map(p => (n, u, p._1, p._2))
      }
      .toDF("name", "user_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
  }
}
