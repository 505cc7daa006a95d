package graft.testgen

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scala port of the reference's synthetic-population generator
  * (ref: tests/generate_fake_dataset.py, 242 LoC — persons with munged
  * duplicate records; the `uuid` column is ground truth). Keeps the same
  * munging classes and rates (SURVEY.md §5.4) so quality gates transfer:
  * nickname swaps 20%, female surname changes, ssn missing 15% /
  * perturbed 1%, sex missing 5% / flipped 0.1%, dob missing 5% + error
  * classes, twins 2.5% sharing dob/lastname with ±1 ssn, and
  * ~expovariate(1/20) records per person.
  *
  * Driver-side generation (test fixture only — population sizes are
  * thousands); the OUTPUT is a distributed DataFrame.
  */
object FakePersons {

  final case class Entry(
      uuid: String,
      first_name: String,
      last_name: String,
      ssn: String,
      sex: String,
      dob: String,
      entry_id: Long)

  private val firstNames = Vector("james", "mary", "robert", "patricia",
    "john", "jennifer", "michael", "linda", "david", "elizabeth", "william",
    "barbara", "richard", "susan", "joseph", "jessica", "thomas", "sarah",
    "charles", "karen", "christopher", "lisa", "daniel", "nancy", "matthew",
    "betty", "anthony", "margaret", "mark", "sandra", "donald", "ashley",
    "steven", "kimberly", "paul", "emily", "andrew", "donna", "joshua",
    "michelle")
  private val nicknames = Map(
    "james" -> "jim", "robert" -> "bob", "john" -> "jack",
    "michael" -> "mike", "william" -> "bill", "richard" -> "dick",
    "joseph" -> "joe", "thomas" -> "tom", "christopher" -> "chris",
    "daniel" -> "dan", "matthew" -> "matt", "anthony" -> "tony",
    "steven" -> "steve", "andrew" -> "andy", "joshua" -> "josh",
    "jennifer" -> "jen", "elizabeth" -> "liz", "jessica" -> "jess",
    "patricia" -> "pat", "margaret" -> "peggy", "kimberly" -> "kim")
  private val lastNames = Vector("smith", "johnson", "williams", "brown",
    "jones", "garcia", "miller", "davis", "rodriguez", "martinez",
    "hernandez", "lopez", "gonzalez", "wilson", "anderson", "thomas",
    "taylor", "moore", "jackson", "martin", "lee", "perez", "thompson",
    "white", "harris", "sanchez", "clark", "ramirez", "lewis", "robinson")

  private final case class Person(
      uuid: String, first: String, last: String, ssn: String, sex: String,
      dob: String)

  private def typo(r: Random, s: String): String = {
    if (s.isEmpty) s
    else {
      val i = r.nextInt(s.length)
      s.updated(i, ('a' + r.nextInt(26)).toChar)
    }
  }

  private def mungeDob(r: Random, dob: String): String = {
    val parts = dob.split("-").map(_.toInt)
    var (y, m, d) = (parts(0), parts(1), parts(2))
    r.nextInt(8) match {
      case 0 => val t = m; m = math.min(d, 12); d = t // day/month swap
      case 1 => d = math.max(1, math.min(28, d + (if (r.nextBoolean()) 1 else -1)))
      case 2 => m = math.max(1, math.min(12, m + (if (r.nextBoolean()) 1 else -1)))
      case 3 => y = y + (if (r.nextBoolean()) 1 else -1)
      case 4 => d = 1 + r.nextInt(28)
      case 5 => m = 1 + r.nextInt(12)
      case 6 => y = y - 10 + r.nextInt(21)
      case _ => // ±N(0, 365/2) days ≈ keep-year perturbation
        d = 1 + r.nextInt(28); m = 1 + r.nextInt(12)
    }
    f"$y%04d-$m%02d-$d%02d"
  }

  private def mungeRecord(r: Random, p: Person): Person = {
    var first = p.first
    var last = p.last
    var ssn = p.ssn
    var sex = p.sex
    var dob = p.dob
    // nickname swap 20% (ref :98-99)
    if (r.nextDouble() < 0.2)
      first = nicknames.getOrElse(first, first)
    // female surname change ~10% (ref :107-110)
    if (sex == "F" && r.nextDouble() < 0.1)
      last = lastNames(r.nextInt(lastNames.size))
    // ssn missing 15% / digit-perturbed 1% (ref :121-130)
    if (r.nextDouble() < 0.15) ssn = null
    else if (r.nextDouble() < 0.01) ssn = typoDigit(r, ssn)
    // sex missing 5% / flipped 0.1% (ref :132-135)
    if (r.nextDouble() < 0.05) sex = null
    else if (r.nextDouble() < 0.001) sex = if (sex == "M") "F" else "M"
    // dob missing 5%, else error classes 10% (ref :137-159)
    if (r.nextDouble() < 0.05) dob = null
    else if (r.nextDouble() < 0.1) dob = mungeDob(r, dob)
    // uniform typos ~1/3000 per char (ref :204-217) — applied per field
    if (r.nextDouble() < first.length / 3000.0) first = typo(r, first)
    if (r.nextDouble() < last.length / 3000.0) last = typo(r, last)
    Person(p.uuid, first, last, ssn, sex, dob)
  }

  private def typoDigit(r: Random, ssn: String): String = {
    if (ssn == null) return null
    val digits = ssn.indices.filter(i => ssn(i).isDigit)
    if (digits.isEmpty) ssn
    else {
      val i = digits(r.nextInt(digits.size))
      ssn.updated(i, ('0' + r.nextInt(10)).toChar)
    }
  }

  /** Generate a population of `nPersons` with duplicate munged records.
    * Deterministic for a fixed seed (the engine's analog of the
    * PYTHONHASHSEED contract, ref pgdedupe/run.py:120-125).
    */
  def population(spark: SparkSession, nPersons: Int,
      seed: Long = 123L): DataFrame = {
    import spark.implicits._
    val r = new Random(seed)
    val persons = (0 until nPersons).map { i =>
      val sex = if (r.nextBoolean()) "M" else "F"
      val p = Person(
        uuid = f"person-$i%06d",
        first = firstNames(r.nextInt(firstNames.size)),
        last = lastNames(r.nextInt(lastNames.size)),
        ssn = f"${r.nextInt(900)}%03d-${r.nextInt(89) + 10}%02d-${r.nextInt(9000) + 1000}%04d",
        sex = sex,
        dob = f"${1940 + r.nextInt(70)}%04d-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d")
      p
    }
    // twins 2.5%: share dob + last name, ssn ±1 (ref :171-183, :219-224)
    val twins = persons.filter(_ => r.nextDouble() < 0.025).map { p =>
      val base = p.ssn.replace("-", "").toLong
      val t = (base + 1).toString.reverse.padTo(9, '0').reverse.mkString
      p.copy(
        uuid = p.uuid + "-twin",
        first = firstNames(r.nextInt(firstNames.size)),
        ssn = s"${t.substring(0, 3)}-${t.substring(3, 5)}-${t.substring(5)}")
    }
    var entryId = 0L
    val entries = (persons ++ twins).flatMap { p =>
      // records-per-person ~ 1 + expovariate(1/20) capped (ref :226-232)
      val n = 1 + math.min(60, math.round(-20.0 * math.log(
        math.max(1e-12, r.nextDouble()))).toInt / 4)
      (0 until n).map { _ =>
        entryId += 1
        val m = mungeRecord(r, p)
        Entry(p.uuid, m.first, m.last, m.ssn, m.sex, m.dob, entryId)
      }
    }
    spark.createDataset(entries).toDF()
  }
}
