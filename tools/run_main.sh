#!/bin/bash
# Launch a graft main class against the compiled classes + the Spark 4.1.2
# unmanaged jars, with the JDK17 module opens Spark needs. Mirrors what
# `sbt runMain` does without taking the sbt build lock, so long bench
# chains can run while the build tooling stays usable.
#   tools/run_main.sh [-Xmx…] graft.Bench /root/testdata/sf0.1
cd "$(dirname "$0")/.." || exit 1
XMX="-Xmx96g"
if [[ "$1" == -Xmx* ]]; then XMX="$1"; shift; fi
exec java $XMX \
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
