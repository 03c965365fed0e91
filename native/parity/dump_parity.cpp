// Reference-parity fixture generator.
//
// Links against the reference KataGo build (dummy NN backend) and plays
// seeded pseudo-random legal games under several rulesets, dumping per-move
// legality masks, periodic V7 featurizer rows (NNInputs::fillRowV7,
// reference cpp/neuralnet/nninputs.cpp:2300+), and final scores
// (BoardHistory::endAndScoreGameNow). The output fixture is replayed by
// tests/test_reference_parity.py against katago_tpu's own rules engine and
// featurizer.
//
// This file is original harness code for katago_tpu; it only *calls* the
// reference's public APIs. Build (objects from a cmake build of
// /root/reference/cpp with -DUSE_BACKEND= -DNO_GIT_REVISION=1):
//
//   g++ -O2 -std=c++17 -I/root/reference/cpp dump_parity.cpp \
//       $(ls build/CMakeFiles/katago.dir/{core,game,neuralnet,search,dataio,book,program,command,tests}/*.o \
//          | grep -v main.cpp.o) -lzip -lz -lpthread -o dump_parity
//
// Output format (text, one token stream):
//   GAME <i> SIZE <s> RULES <string> KOMI <k>
//   TOMOVE <B|W>
//   LEGAL <NN+1 chars '0'/'1'>           (row-major y*size+x, last = pass)
//   V7SP <22*NN floats %.9g, CHW>        (every SP_EVERY moves)
//   V7GL <19 floats %.9g>
//   MOVE <loc or -1 for pass>            (the move actually played)
//   ...
//   END WINNER <B|W|0> SCORE <whiteMinusBlack %.9g>

#include <cstdio>
#include <cstdint>
#include <string>
#include <vector>

#include "game/board.h"
#include "game/rules.h"
#include "game/boardhistory.h"
#include "neuralnet/nninputs.h"

namespace {

uint64_t rngState = 0x9E3779B97F4A7C15ULL;

uint64_t nextRand() {
  // xorshift64* — harness-local PRNG, deterministic fixture generation
  rngState ^= rngState >> 12;
  rngState ^= rngState << 25;
  rngState ^= rngState >> 27;
  return rngState * 0x2545F4914F6CDD1DULL;
}

double nextUniform() {
  return (double)(nextRand() >> 11) / (double)(1ULL << 53);
}

void dumpGame(int gameIdx, int size, const std::string& rulesStr,
              uint64_t seed, int spEvery, int maxMoves) {
  rngState = seed;
  Rules rules = Rules::parseRules(rulesStr);
  Board board(size, size);
  BoardHistory hist(board, P_BLACK, rules, 0, false);

  printf("GAME %d SIZE %d RULES %s KOMI %.9g\n", gameIdx, size,
         rulesStr.c_str(), rules.komi);

  int nn = size * size;
  std::vector<float> rowBin(NNInputs::NUM_FEATURES_SPATIAL_V7 * nn);
  std::vector<float> rowGlobal(NNInputs::NUM_FEATURES_GLOBAL_V7);
  Player pla = P_BLACK;

  for(int turn = 0; turn < maxMoves && !hist.isGameFinished; turn++) {
    printf("TOMOVE %c\n", pla == P_BLACK ? 'B' : 'W');

    // legality mask for every board point + pass, row-major
    std::string legal(nn + 1, '0');
    std::vector<Loc> legalLocs;
    for(int y = 0; y < size; y++) {
      for(int x = 0; x < size; x++) {
        Loc loc = Location::getLoc(x, y, size);
        if(hist.isLegal(board, loc, pla)) {
          legal[y * size + x] = '1';
          legalLocs.push_back(loc);
        }
      }
    }
    if(hist.isLegal(board, Board::PASS_LOC, pla))
      legal[nn] = '1';
    printf("LEGAL %s\n", legal.c_str());

    if(turn % spEvery == 0) {
      MiscNNInputParams params;
      // CHW layout (useNHWC=false): plane-major dump
      NNInputs::fillRowV7(board, hist, pla, params, size, size, false,
                          rowBin.data(), rowGlobal.data());
      printf("V7SP");
      for(size_t i = 0; i < rowBin.size(); i++)
        printf(" %.9g", rowBin[i]);
      printf("\n");
      printf("V7GL");
      for(size_t i = 0; i < rowGlobal.size(); i++)
        printf(" %.9g", rowGlobal[i]);
      printf("\n");
    }

    // pick a move: mostly uniform over legal board moves, some passes
    Loc move = Board::PASS_LOC;
    if(!legalLocs.empty() && nextUniform() >= 0.04)
      move = legalLocs[nextRand() % legalLocs.size()];
    int moveIdx = -1;
    if(move != Board::PASS_LOC)
      moveIdx = Location::getY(move, size) * size + Location::getX(move, size);
    printf("MOVE %d\n", moveIdx);
    hist.makeBoardMoveAssumeLegal(board, move, pla, NULL);
    pla = getOpp(pla);
  }

  if(!hist.isGameFinished)
    hist.endAndScoreGameNow(board);
  char winner = hist.winner == P_BLACK ? 'B'
              : hist.winner == P_WHITE ? 'W' : '0';
  printf("END WINNER %c SCORE %.9g NORESULT %d\n", winner,
         hist.isNoResult ? 0.0 : hist.finalWhiteMinusBlackScore,
         hist.isNoResult ? 1 : 0);
}

}  // namespace

int main() {
  Board::initHash();
  ScoreValue::initTables();

  struct Spec { int size; const char* rules; int games; int spEvery; };
  const Spec specs[] = {
    {9,  "tromp-taylor", 4, 4},
    {9,  "chinese", 3, 4},
    {9,  "japanese", 3, 4},
    {9,  "koSPIGHTscoreTERRITORYtaxSEKIsui0komi6.5", 2, 4},
    {13, "koSITUATIONALscoreAREAtaxNONEsui0button1komi7.5", 2, 6},
    {13, "koPOSITIONALscoreAREAtaxALLsui1komi7", 2, 6},
    {19, "tromp-taylor", 2, 12},
    {19, "japanese", 1, 12},
  };

  int gameIdx = 0;
  uint64_t seed = 12345;
  for(const Spec& spec : specs) {
    for(int g = 0; g < spec.games; g++) {
      int maxMoves = spec.size * spec.size * 7 / 2;
      dumpGame(gameIdx, spec.size, spec.rules, seed + gameIdx * 1000003ULL,
               spec.spEvery, maxMoves);
      gameIdx++;
    }
  }
  ScoreValue::freeTables();
  return 0;
}
