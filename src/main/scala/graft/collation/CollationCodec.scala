package graft.collation

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving byte encoding of CouchDB-collated keys.
  *
  * Unsigned-lexicographic comparison of the encoded bytes equals CouchDB view
  * collation (null &lt; false &lt; true &lt; numbers &lt; strings &lt; arrays
  * &lt; objects; arrays element-wise, numbers as IEEE754 doubles). This is the
  * ordering the reference engine (pouchdb/mapreduce — view rows sorted by
  * emitted key per the CouchDB collation spec) guarantees for view rows, here
  * re-expressed so that Spark's BinaryType comparison, parquet min/max
  * statistics, and range predicates implement key order natively.
  *
  * Layout (all tags &gt;= 0x01 so the 0x00 terminator of variable-length
  * values always sorts before any sibling element):
  * {{{
  *   0x01 null | 0x02 false | 0x03 true
  *   0x04 number : 8-byte big-endian IEEE754 double; d >= 0 → flip sign bit,
  *                 d < 0 → flip all bits (gives a total order over doubles)
  *   0x05 string : UTF-8 bytes with 0x00 escaped as 0x00 0xFF, then 0x00 0x00
  *   0x06 array  : concat(encode(elem)*) then 0x00
  *   0x07 object : concat(encode(fieldName), encode(value))* then 0x00
  * }}}
  *
  * Documented deviation from CouchDB: string order is UTF-8 code-point order
  * rather than ICU collation (PouchDB's practical behavior for ASCII keys).
  *
  * Numbers follow JSON semantics: every numeric key encodes through
  * `Double`, so integral keys beyond 2^53 lose precision — two longs that
  * differ only below double granularity collate as the SAME key (their
  * rows remain distinct and doc id breaks the tie), exactly as a
  * JavaScript engine would treat them.
  */
object CollationCodec {
  final val TNull: Byte = 0x01
  final val TFalse: Byte = 0x02
  final val TTrue: Byte = 0x03
  final val TNum: Byte = 0x04
  final val TStr: Byte = 0x05
  final val TArr: Byte = 0x06
  final val TObj: Byte = 0x07

  /** Sorts after every encodable key (no tag reaches 0xFF). CouchDB's `{}` /
    * "high key" sentinel for open-ended endkey ranges. */
  val MaxKey: Array[Byte] = Array(0xFF.toByte)

  /** Empty byte array: sorts before every encodable key (all tags >= 0x01). */
  val MinKey: Array[Byte] = Array.emptyByteArray

  private def writeDouble(out: ByteArrayOutputStream, d: Double): Unit = {
    var bits = java.lang.Double.doubleToLongBits(d)
    bits = if (bits >= 0L) bits ^ Long.MinValue else ~bits
    var i = 56
    while (i >= 0) { out.write(((bits >>> i) & 0xFF).toInt); i -= 8 }
  }

  /** Locale-aware string weight bytes (java.text.Collator, root locale,
    * tertiary strength) — the optional stand-in for CouchDB's ICU
    * collation: accented letters group with their base letter ("é"
    * between "e…" and "f…"), case differences rank below letter
    * differences. Collator instances are not thread-safe → one per
    * thread. The weight bytes are escaped/terminated exactly like UTF-8
    * payloads, so order preservation carries over unchanged. */
  private val rootCollator = new ThreadLocal[java.text.Collator] {
    override def initialValue(): java.text.Collator = {
      val c = java.text.Collator.getInstance(java.util.Locale.ROOT)
      c.setStrength(java.text.Collator.TERTIARY)
      c
    }
  }

  private def stringPayload(s: String, locale: Boolean): Array[Byte] =
    if (locale) rootCollator.get.getCollationKey(s).toByteArray
    else s.getBytes("UTF-8")

  private def writeStringBytes(out: ByteArrayOutputStream, bytes: Array[Byte]): Unit = {
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0x00) { out.write(0x00); out.write(0xFF) } else out.write(b.toInt)
      i += 1
    }
    out.write(0x00); out.write(0x00)
  }

  /** Encode a Catalyst-internal value of the given DataType. Used by the
    * [[CollationKey]] expression (both interpreted eval and codegen call
    * here). `locale = true` switches string payloads to collator weight
    * bytes (see [[stringPayload]]).
    */
  def encodeInternal(v: Any, dt: DataType, locale: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    writeInternal(out, v, dt, locale)
    out.toByteArray
  }

  def encodeInternal(v: Any, dt: DataType): Array[Byte] =
    encodeInternal(v, dt, locale = false)

  private def writeInternal(out: ByteArrayOutputStream, v: Any, dt: DataType,
                            locale: Boolean): Unit = {
    if (v == null) { out.write(TNull.toInt); return }
    dt match {
      case BooleanType =>
        out.write(if (v.asInstanceOf[Boolean]) TTrue.toInt else TFalse.toInt)
      case ByteType => writeNum(out, v.asInstanceOf[Byte].toDouble)
      case ShortType => writeNum(out, v.asInstanceOf[Short].toDouble)
      case IntegerType => writeNum(out, v.asInstanceOf[Int].toDouble)
      case LongType => writeNum(out, v.asInstanceOf[Long].toDouble)
      case FloatType => writeNum(out, v.asInstanceOf[Float].toDouble)
      case DoubleType => writeNum(out, v.asInstanceOf[Double])
      case _: DecimalType => writeNum(out, v.asInstanceOf[Decimal].toDouble)
      case DateType => writeNum(out, v.asInstanceOf[Int].toDouble)
      case TimestampType | TimestampNTZType => writeNum(out, v.asInstanceOf[Long].toDouble)
      case StringType =>
        out.write(TStr.toInt)
        val u = v.asInstanceOf[UTF8String]
        // fast path: UTF8String bytes are already the UTF-8 payload
        writeStringBytes(out,
          if (locale) stringPayload(u.toString, locale = true) else u.getBytes)
      case BinaryType =>
        out.write(TStr.toInt)
        writeStringBytes(out, v.asInstanceOf[Array[Byte]])
      case ArrayType(et, _) =>
        out.write(TArr.toInt)
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          writeInternal(out, if (arr.isNullAt(i)) null else arr.get(i, et), et,
            locale)
          i += 1
        }
        out.write(0x00)
      case st: StructType =>
        out.write(TObj.toInt)
        val row = v.asInstanceOf[InternalRow]
        var i = 0
        while (i < st.length) {
          out.write(TStr.toInt)
          writeStringBytes(out, stringPayload(st(i).name, locale))
          val fdt = st(i).dataType
          writeInternal(out, if (row.isNullAt(i)) null else row.get(i, fdt),
            fdt, locale)
          i += 1
        }
        out.write(0x00)
      case MapType(kt, vt, _) =>
        out.write(TObj.toInt)
        val m = v.asInstanceOf[MapData]
        val ks = m.keyArray(); val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          writeInternal(out, if (ks.isNullAt(i)) null else ks.get(i, kt), kt,
            locale)
          writeInternal(out, if (vs.isNullAt(i)) null else vs.get(i, vt), vt,
            locale)
          i += 1
        }
        out.write(0x00)
      case other =>
        throw new IllegalArgumentException(s"collation_key: unsupported type $other")
    }
  }

  private def writeNum(out: ByteArrayOutputStream, d: Double): Unit = {
    out.write(TNum.toInt); writeDouble(out, d)
  }

  /** Encode a plain Scala/JVM value (driver-side literals for
    * startkey/endkey/key/keys query options). Mirrors [[encodeInternal]]. */
  def encodeScala(v: Any, locale: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(32)
    writeScala(out, v, locale)
    out.toByteArray
  }

  private def writeScala(out: ByteArrayOutputStream, v: Any,
                         locale: Boolean): Unit = v match {
    case null => out.write(TNull.toInt)
    case b: Boolean => out.write(if (b) TTrue.toInt else TFalse.toInt)
    case n: Byte => writeNum(out, n.toDouble)
    case n: Short => writeNum(out, n.toDouble)
    case n: Int => writeNum(out, n.toDouble)
    case n: Long => writeNum(out, n.toDouble)
    case n: Float => writeNum(out, n.toDouble)
    case n: Double => writeNum(out, n)
    case n: BigDecimal => writeNum(out, n.toDouble)
    case n: java.math.BigDecimal => writeNum(out, n.doubleValue)
    case d: java.sql.Date => writeNum(out, d.toLocalDate.toEpochDay.toDouble)
    case d: java.time.LocalDate => writeNum(out, d.toEpochDay.toDouble)
    case t: java.sql.Timestamp =>
      writeNum(out, (t.getTime * 1000L + (t.getNanos / 1000) % 1000).toDouble)
    case t: java.time.Instant =>
      writeNum(out, (t.getEpochSecond * 1000000L + t.getNano / 1000).toDouble)
    case t: java.time.LocalDateTime => // TIMESTAMP_NTZ: wall-clock micros
      writeNum(out, (t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000).toDouble)
    case s: String =>
      out.write(TStr.toInt); writeStringBytes(out, stringPayload(s, locale))
    case bytes: Array[Byte] => out.write(TStr.toInt); writeStringBytes(out, bytes)
    case seq: Seq[_] =>
      out.write(TArr.toInt); seq.foreach(writeScala(out, _, locale)); out.write(0x00)
    case arr: Array[_] =>
      out.write(TArr.toInt); arr.foreach(writeScala(out, _, locale)); out.write(0x00)
    case m: scala.collection.Map[_, _] =>
      out.write(TObj.toInt)
      m.foreach { case (k, x) =>
        writeScala(out, k, locale); writeScala(out, x, locale) }
      out.write(0x00)
    case other =>
      throw new IllegalArgumentException(
        s"collation key literal: unsupported ${other.getClass.getName}")
  }

  /** Model comparator over plain Scala values implementing the CouchDB
    * collation spec directly — the test oracle for the byte encoding. */
  def modelCompare(a: Any, b: Any): Int = {
    val ra = rank(a); val rb = rank(b)
    if (ra != rb) return java.lang.Integer.compare(ra, rb)
    (a, b) match {
      case (null, null) => 0
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case (x, y) if ra == 3 =>
        java.lang.Double.compare(toDouble(x), toDouble(y))
      case (x: String, y: String) =>
        // UTF-8 byte order == code-point order
        compareBytes(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      case (x: Seq[_], y: Seq[_]) =>
        val it = x.iterator.zip(y.iterator)
        while (it.hasNext) {
          val (xe, ye) = it.next()
          val c = modelCompare(xe, ye)
          if (c != 0) return c
        }
        java.lang.Integer.compare(x.length, y.length)
      case _ => 0
    }
  }

  private def rank(v: Any): Int = v match {
    case null => 0
    case false => 1
    case true => 2
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double => 3
    case _: String => 4
    case _: Seq[_] => 5
    case _ => 6
  }

  private def toDouble(v: Any): Double = v match {
    case n: Byte => n.toDouble
    case n: Short => n.toDouble
    case n: Int => n.toDouble
    case n: Long => n.toDouble
    case n: Float => n.toDouble
    case n: Double => n
  }

  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xFF, b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }
}
