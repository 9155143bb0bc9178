#!/bin/bash
# Launch a graft main class against the compiled classes + the Spark 4.1.2
# unmanaged jars, with the JDK17 module opens Spark needs. Mirrors what
# `sbt runMain` does without taking the sbt build lock, so long bench
# chains can run while the build tooling stays usable.
#   tools/run_main.sh [-Xmx…] graft.Bench /root/testdata/sf0.1
cd "$(dirname "$0")/.." || exit 1
# Default heap mirrors build.sbt: 16g unless SPARK_DRIVER_MEM overrides,
# with the -Xmx positional still winning (hosts with less RAM must not
# fail to start just because a 96g default was baked in).
XMX="-Xmx${SPARK_DRIVER_MEM:-16g}"
if [[ "$1" == -Xmx* ]]; then XMX="$1"; shift; fi
# ReservedCodeCacheSize matches build.sbt: the JVM default 240m code cache
# fills during a 106-query chain and deopts later queries 2-5x — numbers
# from this script must be comparable to `sbt runMain` numbers.
exec java $XMX -XX:ReservedCodeCacheSize=1g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
