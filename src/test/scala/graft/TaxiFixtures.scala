package graft

import java.nio.file.{Files, Path, Paths}

/** Synthetic taxi micro-CSVs matching the reference input contract
  * (FIXTURES.md §A): 17 comma-separated fields, header + malformed lines
  * present to exercise every skip/keep rule of Sample.cs:153-157.
  */
object TaxiFixtures {

  val header: String =
    "VendorID,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count," +
      "trip_distance,RatecodeID,store_and_fwd_flag,PULocationID,DOLocationID," +
      "payment_type,fare_amount,extra,mta_tax,tip_amount,tolls_amount," +
      "improvement_surcharge,total_amount"

  /** A fully-populated valid 17-field line. */
  def row(pickup: String, dropoff: String, dist: Double): String =
    s"2,$pickup,$dropoff,1,$dist,1,N,100,200,1,10.0,0.5,0.5,1.0,0.0,0.3,12.3"

  // File A: Sunday 30mph; Monday 10, 20 and a kept NEGATIVE -5 mph
  // (dropoff < pickup); plus every skip rule: header, blank, 16-field,
  // 18-field, zero-duration (Infinity speed), zero-distance.
  val fileALines: Seq[String] = Seq(
    header,
    "",
    row("2017-01-01 10:00:00", "2017-01-01 11:00:00", 30.0),  // Sun 30mph
    row("2017-01-02 10:00:00", "2017-01-02 11:00:00", 10.0),  // Mon 10mph
    row("2017-01-02 12:00:00", "2017-01-02 12:30:00", 10.0),  // Mon 20mph
    row("2017-01-02 14:00:00", "2017-01-02 13:00:00", 5.0),   // Mon -5mph KEPT
    row("2017-01-02 10:00:00", "2017-01-02 10:00:00", 5.0),   // Inf → dropped
    row("2017-01-02 10:00:00", "2017-01-02 11:00:00", 0.0),   // dist 0 → dropped
    "1,2017-01-02 10:00:00,2017-01-02 11:00:00,1,5.0,1,N,1,1,1,1,1,1,1,1,1", // 16 fields
    "1,2017-01-02 10:00:00,2017-01-02 11:00:00,1,5.0,1,N,1,1,1,1,1,1,1,1,1,1,1") // 18 fields

  // File B: Sunday 20 mph; Tuesday 20 mph. No Monday → zero-fill check.
  val fileBLines: Seq[String] = Seq(
    header,
    row("2017-01-08 08:00:00", "2017-01-08 09:00:00", 20.0),  // Sun 20mph
    row("2017-01-03 08:00:00", "2017-01-03 10:00:00", 40.0))  // Tue 20mph

  // File C: every data row is rejected by the value filters (zero
  // distance) — in the reference this file still contributes an
  // all-zero day vector to the cross-file mean (Sample.cs:196-199).
  val fileCLines: Seq[String] = Seq(
    header,
    row("2017-01-04 09:00:00", "2017-01-04 10:00:00", 0.0),
    row("2017-01-05 09:00:00", "2017-01-05 10:00:00", 0.0))

  // Hand-computed goldens (Sunday=0 numbering):
  //   file A day-means: d0=30, d1=(10+20-5)/3=25/3, d2..d6=0
  //   file B day-means: d0=20, d2=20, d1,d3..d6=0
  //   file C day-means: all 0 (no surviving rows)
  // Data-derived groups (A, B only — C has no surviving rows):
  val faithfulExpected: Map[Int, Double] = Map(
    0 -> 25.0, 1 -> 25.0 / 6.0, 2 -> 10.0, 3 -> 0.0, 4 -> 0.0, 5 -> 0.0, 6 -> 0.0)
  // Listing-derived groups (A, B, C — reference-exact):
  val faithfulListedExpected: Map[Int, Double] = Map(
    0 -> 50.0 / 3.0, 1 -> 25.0 / 9.0, 2 -> 20.0 / 3.0,
    3 -> 0.0, 4 -> 0.0, 5 -> 0.0, 6 -> 0.0)
  // weighted: only days with surviving rows appear
  val weightedExpected: Map[Int, Double] = Map(
    0 -> 25.0, 1 -> 25.0 / 3.0, 2 -> 20.0)

  /** Accepted (17-field, int-probe) data rows across all three files. */
  val nAcceptedRows: Int = 10 // A: 6, B: 2, C: 2

  /** Writes the fixture files into a fresh dir under target/, returns it. */
  def writeDir(): Path = {
    val base = Paths.get("target", "test-tmp")
    Files.createDirectories(base)
    val dir = Files.createTempDirectory(base, "taxi")
    Files.write(dir.resolve("yellow_tripdata_2017-01.csv"),
      fileALines.mkString("\n").getBytes("UTF-8"))
    Files.write(dir.resolve("yellow_tripdata_2017-02.csv"),
      fileBLines.mkString("\n").getBytes("UTF-8"))
    Files.write(dir.resolve("yellow_tripdata_2017-03.csv"),
      fileCLines.mkString("\n").getBytes("UTF-8"))
    dir
  }
}
