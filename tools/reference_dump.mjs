// Cross-validation dump: runs the REFERENCE pipeline in Node and writes
// distributional metrics per fixed config so tests/test_reference_parity.py
// can compare the TPU build against the original (SURVEY.md §4c).
//
// This container has no JS runtime, so the dumps cannot be produced here —
// run on any machine with node >= 18:
//
//     cd <reference checkout>            # raguilar011095/planet_heightmap_generation
//     npm install delaunator@5.0.1
//     node --experimental-vm-modules /path/to/reference_dump.mjs ./js \
//          /path/to/repo/tools/reference_dumps
//
// Then `pytest tests/test_reference_parity.py` picks the dumps up.

import { mkdirSync, writeFileSync } from "node:fs";
import { pathToFileURL } from "node:url";

const jsDir = process.argv[2] || "./js";
const outDir = process.argv[3] || "./reference_dumps";

const u = (f) => pathToFileURL(`${jsDir}/${f}`).href;
const { makeRng } = await import(u("rng.js"));
const { SimplexNoise } = await import(u("simplex-noise.js"));
const { setDelaunator, buildSphere, computeNeighborDist } =
  await import(u("sphere-mesh.js"));
const { generateCoarsePlates, projectCoarsePlates } =
  await import(u("coarse-plates.js"));
const { smoothAndReconnectPlates } = await import(u("plates.js"));
const { assignElevation } = await import(u("elevation.js"));
const { buildSuperPlates } = await import(u("super-plates.js"));
const { warpTerrain, smoothElevation, erodeComposite, sharpenRidges,
        applySoilCreep } = await import(u("terrain-post.js"));
const { computeWind } = await import(u("wind.js"));
const { computeOceanCurrents } = await import(u("ocean.js"));
const { computePrecipitation } = await import(u("precipitation.js"));
const { computeTemperature } = await import(u("temperature.js"));
const { classifyKoppen } = await import(u("koppen.js"));
const Delaunator = (await import("delaunator")).default;
setDelaunator(Delaunator);

// the fixed validation configs — keep in sync with
// tests/test_reference_parity.py:CONFIGS
const CONFIGS = [
  { name: "c40k_s42", seed: 42, N: 40000, P: 80, numContinents: 4 },
  { name: "c40k_s7", seed: 7, N: 40000, P: 80, numContinents: 4 },
  { name: "c20k_s123", seed: 123, N: 20000, P: 40, numContinents: 3 },
];

function metrics(r_elevation, koppen, r_plate, nCells) {
  let land = 0;
  const hist = new Array(20).fill(0); // elevation histogram over [-1, 1]
  for (let i = 0; i < nCells; i++) {
    const e = r_elevation[i];
    if (e > 0) land++;
    const b = Math.max(0, Math.min(19, Math.floor((e + 1) * 10)));
    hist[b]++;
  }
  const kopCount = {};
  if (koppen) {
    for (let i = 0; i < nCells; i++)
      kopCount[koppen[i]] = (kopCount[koppen[i]] || 0) + 1;
  }
  const plates = new Set();
  for (let i = 0; i < nCells; i++) plates.add(r_plate[i]);
  return {
    land_fraction: land / nCells,
    elevation_hist: hist.map((h) => h / nCells),
    koppen_dist: kopCount,
    plate_count: plates.size,
  };
}

mkdirSync(outDir, { recursive: true });
for (const cfg of CONFIGS) {
  const { seed, N, P, numContinents } = cfg;
  const nMag = 0.25, spread = 5, landCoverage = 0.3;
  const rng = makeRng(seed);
  const { mesh, r_xyz } = buildSphere(N, 0.75, rng);
  const neighborDist = computeNeighborDist(mesh, r_xyz);
  const { coarseMesh, coarse_xyz, coarse_r_plate, coarsePlateSeeds,
          coarsePlateVec, coarsePlateIsOcean } =
    generateCoarsePlates(seed, P, numContinents, 0, landCoverage);
  const r_plate = projectCoarsePlates(mesh, r_xyz, coarseMesh, coarse_xyz,
                                      coarse_r_plate, seed, P);
  smoothAndReconnectPlates(mesh, r_plate, coarsePlateSeeds, 3);
  const plateIsOcean = coarsePlateIsOcean;
  const plateDensity = {};
  for (const r of coarsePlateSeeds) {
    const drng = makeRng(r + 777);
    const dOcean = 3.0 + drng() * 0.5;
    const dLand = 2.4 + drng() * 0.5;
    plateDensity[r] = plateIsOcean.has(r) ? dOcean : dLand;
  }
  const noise = new SimplexNoise(seed);
  const superPlateData = P >= 8
    ? buildSuperPlates(mesh, r_plate, coarsePlateSeeds, coarsePlateVec,
                       plateIsOcean, plateDensity)
    : null;
  const { r_elevation } = assignElevation(
    mesh, r_xyz, plateIsOcean, r_plate, coarsePlateVec, coarsePlateSeeds,
    noise, nMag, seed, spread, plateDensity, superPlateData);

  // post-processing with the default sliders, mirroring runPostProcessing
  // (js/planet-worker.js:40-102): smoothing 0.3, hydraulic 0.5, thermal
  // 0.1, ridge 0.35, warp 0.5, glacial 0
  warpTerrain(mesh, r_elevation, r_xyz, seed, 0.5, null);
  const isOcean = new Uint8Array(mesh.numRegions);
  for (let i = 0; i < mesh.numRegions; i++) isOcean[i] = r_elevation[i] <= 0;
  smoothElevation(mesh, r_elevation, isOcean, Math.round(1 + 0.3 * 4),
                  0.2 + 0.3 * 0.5);
  erodeComposite(mesh, r_elevation, r_xyz, isOcean,
                 10, 0.5 * 0.0006, 0.5, 1.0,          // hydraulic
                 1, 1.2 - 0.1 * 0.4, 0.1 * 0.15,      // thermal
                 0, 0,                                 // glacial off
                 neighborDist);
  sharpenRidges(mesh, r_elevation, isOcean, Math.round(1 + 0.35 * 3),
                0.35 * 0.08);
  applySoilCreep(mesh, r_elevation, isOcean, 3, 0.1125);

  const windResult = computeWind(mesh, r_xyz, r_elevation, plateIsOcean,
                                 r_plate, noise);
  const oceanResult = computeOceanCurrents(mesh, r_xyz, r_elevation,
                                           windResult);
  const precipResult = computePrecipitation(mesh, r_xyz, r_elevation,
                                            windResult, oceanResult, 0,
                                            landCoverage);
  const tempResult = computeTemperature(mesh, r_xyz, r_elevation, windResult,
                                        oceanResult, precipResult, 0);
  const koppen = classifyKoppen(mesh, r_elevation, tempResult, precipResult);

  const m = metrics(r_elevation, koppen, r_plate, mesh.numRegions);
  writeFileSync(`${outDir}/${cfg.name}.json`,
                JSON.stringify({ config: cfg, metrics: m }, null, 1));
  console.log(cfg.name, "land:", m.land_fraction.toFixed(3));
}
