#!/bin/bash
# Planted-pair recall of the adaptive RP-LSH at x100 (2M vectors): the
# non-vacuous recall datapoint at the corpus size where banding steps to 11 bits.
cd /root/repo
CP="/tmp/plant_classes:/opt/spark/jars/*"
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx40g -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing -Dspark.sql.codegen.cache.maxEntries=5000"
export SPARK_GRAFT_SCALE_REPLICAS=100
export SPARK_GRAFT_SCALE_REUSE=1
export SPARK_GRAFT_SCALE_QUERIES=""
export SPARK_GRAFT_SCALE_PLANT_TAU=0.8
export SPARK_GRAFT_CPUS=16
java $JOPTS -cp "$CP" graft.ScaleProbe
echo "plant rc=$?"
