package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Complex numbers over Spark columns — the reference supports complex
  * dtypes natively (`core/dtypes.py`, SURVEY §1.3); Spark has no complex
  * type, so graft maps `complex128` to a `struct<re: double, im: double>`
  * column and complex arithmetic to pure column expressions (all
  * codegen'd, scan-stage). Field-wise IEEE arithmetic is identical in
  * any engine, so results are oracle-exact with no rounding convention. */
object ComplexOps {

  def complex(re: Column, im: Column): Column =
    struct(re.as("re"), im.as("im"))

  def re(z: Column): Column = z.getField("re")
  def im(z: Column): Column = z.getField("im")

  def add(a: Column, b: Column): Column =
    complex(re(a) + re(b), im(a) + im(b))

  def sub(a: Column, b: Column): Column =
    complex(re(a) - re(b), im(a) - im(b))

  /** (a+bi)(c+di) = (ac − bd) + (ad + bc)i — the textbook expansion, in
    * this exact operation order on both sides of the oracle. */
  def mul(a: Column, b: Column): Column =
    complex(re(a) * re(b) - im(a) * im(b),
      re(a) * im(b) + im(a) * re(b))

  def conj(z: Column): Column = complex(re(z), -im(z))

  /** |z|² = re² + im² — exact double arithmetic (no sqrt). */
  def abs2(z: Column): Column = re(z) * re(z) + im(z) * im(z)

  /** |z| = sqrt(re² + im²). */
  def abs(z: Column): Column = sqrt(abs2(z))

  /** a / b = a·conj(b) / |b|² (field-wise; NULL-free b with |b| > 0). */
  def div(a: Column, b: Column): Column = {
    val d = abs2(b)
    val n = mul(a, conj(b))
    complex(re(n) / d, im(n) / d)
  }
}
