package graft

/** Launches a `graft.*` main class in a CHILD JVM with the test JVM's
  * classpath and JDK-17 --add-opens flags (the only honest way to test
  * engine restarts and client/server wire protocols — nothing
  * in-process can leak catalog or session state across the boundary).
  * Shared by `HiveCatalogSpec` (restart durability) and
  * `ThriftServerSpec` (JDBC client ↔ Thrift server).
  */
object ChildJvm {

  def command(mainClass: String, args: Seq[String]): Seq[String] = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val inherited = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
      .toArray.map(_.toString).filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports"))
    val opens =
      if (inherited.nonEmpty) inherited.toSeq
      else Seq("java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      mainClass) ++ args
  }

  /** Run to completion; returns (exitCode, combined output). */
  def run(mainClass: String, args: Seq[String],
          env: Map[String, String] = Map.empty): (Int, String) = {
    val pb = new ProcessBuilder(command(mainClass, args): _*)
      .redirectErrorStream(true)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val out = new StringBuilder
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .foreach(l => out.append(l).append('\n'))
    (proc.waitFor(), out.toString)
  }
}
