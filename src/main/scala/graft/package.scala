package object graft {
  /** A declared query: (session, scale-factor dir) => result DataFrame.
    * The driver materializes it (Verify) or counts it (Bench). */
  type Q = (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame
}
