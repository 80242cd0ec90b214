package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar ETL transforms (SURVEY.md §2.H). The reference implements
  * these as per-row Python (`scripts/etl.py:35-72`); here each is a
  * built-in Column expression — zero UDFs, fully codegen'd, so they
  * vectorize inside whole-stage codegen at any scale.
  */
object Transforms {

  /** H1: PII anonymization — SHA-256 hex digest (`scripts/etl.py:35-37`). */
  def anonymize(c: Column): Column = sha2(c.cast("string"), 256)

  /** H2: calendar-exact age in whole years at `asOf`
    * (`scripts/etl.py:40-46`): year difference minus one when asOf's
    * (month, day) precedes the birthday. Implemented as the literal
    * (month, day) compare — months_between/12 looks equivalent but its
    * last-day-of-month rule ages Feb-29 DOBs a year early on Feb-28 of
    * non-leap years.
    */
  def age(dob: Column, asOf: Column): Column =
    (year(asOf) - year(dob)
      - when(month(asOf) < month(dob)
        || (month(asOf) === month(dob) && dayofmonth(asOf) < dayofmonth(dob)), 1)
        .otherwise(0)).cast("int")

  /** H3: age → labeled bucket (`scripts/etl.py:49-62`). */
  def ageGroup(age: Column): Column =
    when(age.isNull, "Unknown")
      .when(age < 18, "Child (0-17)")
      .when(age < 35, "Young Adult (18-34)")
      .when(age < 50, "Adult (35-49)")
      .when(age < 65, "Middle-Aged (50-64)")
      .otherwise("Senior (65+)")

  /** B7: validity flag — conjunction of not-null checks over required
    * columns (`scripts/etl.py:110,159,206-211`).
    */
  def validRecord(required: Seq[Column]): Column =
    required.map(_.isNotNull).reduce(_ && _)

  /** H4: Laplace noise via inverse CDF (`fact_visits.sql:40-51`):
    * noise = −(1/ε)·sign(u)·ln(1−2|u|), u ~ U(−0.5, 0.5), clamped ≥ 0.
    * Seeded `rand` — deterministic for a fixed partitioning.
    */
  def laplaceNoised(value: Column, epsilon: Double, seed: Long): Column = {
    val u = rand(seed) - 0.5
    greatest(lit(0.0), value + (lit(-1.0 / epsilon) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))))
  }

  /** H4 (keyed variant): the same Laplace mechanism but with u derived
    * from a per-row key through a Lehmer-style LCG, so the noise is a
    * pure function of (key, salt) — reproducible across engines,
    * partitionings, and retries. Used for oracle-checked tests; the
    * `rand(seed)` variant above matches the reference's RANDOM().
    * u ∈ (−0.5, 0.5) exclusive: hash = (key·2654435761 + salt) mod
    * 1000003, then (hash + 0.5)/1000003 − 0.5 — the half-offset keeps u
    * off ±0.5, where ln(1−2|u|) would be −∞ and silently zero the row.
    */
  def laplaceNoisedKeyed(value: Column, key: Column, epsilon: Double, salt: Long = 42L): Column = {
    // reduce the key mod p BEFORE multiplying: (k mod p)·m ≤ 1e6·2.7e9
    // never overflows a long, and modular arithmetic makes the result
    // identical to (k·m + s) mod p computed without overflow
    val h = pmod(pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L) + lit(salt), lit(1000003L))
    val u = (h.cast("double") + 0.5) / 1000003.0 - 0.5
    greatest(lit(0.0), value + (lit(-1.0 / epsilon) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))))
  }

  /** Efraimidis–Spirakis weighted-sampling key in log domain:
    * ln(u)/w with u a pure (key, salt) uniform through the same LCG as
    * [[laplaceNoisedKeyed]] (the half-offset keeps u off 0, where ln
    * diverges). Taking the top-k rows by this score DESCENDING samples
    * k items without replacement with inclusion probability tracking
    * the weight — no sequential pass, reproducible across engines,
    * partitionings, and retries. Pair with orderBy(desc).limit(k),
    * which plans as TakeOrderedAndProject, never a full sort.
    */
  def weightedSampleKey(key: Column, weight: Column, salt: Long = 42L): Column = {
    val h = pmod(pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L) + lit(salt), lit(1000003L))
    val u = (h.cast("double") + 0.5) / 1000003.0
    log(u) / weight
  }

  /** Gumbel-top-k sampling key: logWeight + (−ln(−ln u)) with u the
    * same pure (key, salt) LCG uniform as [[weightedSampleKey]]. The
    * k largest keys are a without-replacement sample with inclusion
    * probability ∝ exp(logWeight) — the Gumbel-max trick, entirely in
    * log domain so importance weights spanning hundreds of nats never
    * overflow. Reproducible across engines, partitionings, retries;
    * pair with orderBy(desc).limit(k) → TakeOrderedAndProject.
    */
  def gumbelKey(logWeight: Column, key: Column, salt: Long = 7L): Column = {
    val h = pmod(pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L) + lit(salt), lit(1000003L))
    val u = (h.cast("double") + 0.5) / 1000003.0
    logWeight + -log(-log(u))
  }
}
