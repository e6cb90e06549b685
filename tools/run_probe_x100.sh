#!/bin/bash
# Round-11 x100 scale probe for the steep-tail families (VERDICT r10 item 1).
set -x
cd /root/repo
CP="/tmp/probe_classes:/opt/spark/jars/*"
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing -Dspark.sql.codegen.cache.maxEntries=5000"

export SPARK_GRAFT_SCALE_REPLICAS=100
export SPARK_GRAFT_SCALE_FAMILIES="kmv_intersect,pagerank,triangles,er_clusters,fuzzy_match"
export SPARK_GRAFT_SCALE_OUT=bench/scale_probe_steep_x100.json
java $JOPTS -cp "$CP" graft.FamilyScaleProbe > /tmp/probe_x100_family.log 2>&1
echo "family probe rc=$?"

unset SPARK_GRAFT_SCALE_FAMILIES SPARK_GRAFT_SCALE_OUT
export SPARK_GRAFT_SCALE_QUERIES="q_dedup_embedding_lsh,q_dedup_minhash_lsh"
export SPARK_GRAFT_SCALE_OUT=bench/scale_probe_lsh_x100.json
java $JOPTS -cp "$CP" graft.ScaleProbe > /tmp/probe_x100_lsh.log 2>&1
echo "lsh probe rc=$?"
