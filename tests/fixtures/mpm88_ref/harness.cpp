// Golden-trajectory generator: compiles the ACTUAL reference 88-liner
// (/root/reference/mls-mpm88.cpp — its advance()/add_object() are
// included verbatim, its GUI main() renamed away via -Dmain=...) and
// dumps particle positions at frames 0/10/20/40 (frame = 10 substeps
// of dt=1e-4, the reference's frame_dt/dt). Output format:
//   FRAME <k> <n_particles>
//   <x> <y>        (one line per particle, %.9g)
// Build + run (see gen.sh):
//   g++ -O2 -std=c++17 -I. harness.cpp -o harness && ./harness > golden.txt
#include <cstdio>

#define main taichi_reference_main_unused
#include "/root/reference/mls-mpm88.cpp"
#undef main

static void dump(int frame) {
  std::printf("FRAME %d %d\n", frame, (int)particles.size());
  for (auto &p : particles) std::printf("%.9g %.9g\n", p.x.x, p.x.y);
}

int main() {
  particles.clear();
  add_object(Vec(0.55_f, 0.45_f), 0xED553B);
  add_object(Vec(0.45_f, 0.65_f), 0xF2B134);
  add_object(Vec(0.55_f, 0.85_f), 0x068587);
  dump(0);
  int sub = (int)(frame_dt / dt);  // 10
  for (int f = 1; f <= 40; f++) {
    for (int s = 0; s < sub; s++) advance(dt);
    if (f == 10 || f == 20 || f == 40) dump(f);
  }
  return 0;
}
