ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "omics_data_integration_utilitiesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Live JDBC integration surface (test scope only): the public
// org.duckdb:duckdb_jdbc driver jar happens to ship in the image's
// pre-warmed artifact cache; glob for it rather than declaring a
// libraryDependency (offline resolution) or hardcoding cache layout.
// JdbcSpec `assume`s the driver class, so a cache without the jar
// cancels those tests instead of failing the build.
Test / unmanagedJars ++=
  (file(sys.props("user.home")) / ".cache" / "coursier" ** "duckdb_jdbc-*.jar")
    .get().take(1).map(Attributed.blank(_))
// ... and on the run classpath too: q_io_jdbc gates the JDBC-source
// path end-to-end (file database + in-database SQL), so Verify/Bench
// need the driver as well. Same glob; an empty cache simply yields no
// jar and the query raises a clear "driver absent" error.
Compile / unmanagedJars ++=
  (file(sys.props("user.home")) / ".cache" / "coursier" ** "duckdb_jdbc-*.jar")
    .get().take(1).map(Attributed.blank(_))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Forked run output passes straight through to stdout, UNPREFIXED — the
// driver parses Bench's single JSON line from stdout, and sbt's default
// "[info] " log decoration would break that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver parses the bench JSON from the LAST ~2000 chars of stdout;
// sbt's "[success] Total time ..." footer would otherwise trail the JSON
// line inside that window.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
